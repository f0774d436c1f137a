"""Generate a Cocks-Pinch outer curve to BLS12-377 (BW6-761 capability).

Finds E/Fq: y^2 = x^3 + b with embedding degree 6, CM discriminant D=3,
and r = q_BLS12-377 dividing #E(Fq) -- so the outer curve's scalar field
equals the inner curve's BASE field, enabling one-level proof recursion
(Groth16-verifier-in-Groth16, the Clearmatics BW6-761/BLS12-377 pattern,
reference gadgetlib1/gadgets/pairing/bw6_761_bls12_377/).

We generate our own constants (deterministic search, this script) rather
than copying BW6-761's. Run: python scripts/gen_cp6.py
"""
import sys

# inner curve base field = outer scalar field
X = 0x8508C00000000001
R_BLS = X**4 - X**2 + 1
Q_BLS = ((X - 1) ** 2 * R_BLS) // 3 + X   # this is the r of the outer curve


def is_prime(n, rounds=40):
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    import random
    rng = random.Random(0xC0C45)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def tonelli(a, p):
    a %= p
    if a == 0:
        return 0
    assert pow(a, (p - 1) // 2, p) == 1
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, rr = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t = t * c % p
        rr = rr * b % p
    return rr


def main():
    r = Q_BLS
    assert is_prime(r)
    # primitive 6th roots of unity mod r
    h = 2
    while True:
        g = pow(h, (r - 1) // 6, r)
        if pow(g, 3, r) == r - 1 and pow(g, 2, r) != 1:
            break
        h += 1
    s = tonelli(r - 3, r)   # sqrt(-3)
    candidates = []
    for gg in (g, pow(g, 5, r)):
        t0 = (gg + 1) % r
        for y0 in ((t0 - 2) * pow(s, -1, r) % r,
                   (2 - t0) * pow(s, -1, r) % r):
            for i in range(8):
                for j in range(8):
                    t = t0 + i * r
                    y = y0 + j * r
                    v = t * t + 3 * y * y
                    if v % 4 != 0:
                        continue
                    q = v // 4
                    if q % 6 != 1:
                        continue
                    if not is_prime(q):
                        continue
                    n = q + 1 - t
                    if n % r != 0:
                        continue
                    candidates.append((q, t, y, n))
    if not candidates:
        print("no candidate found; widen search")
        sys.exit(1)
    # smallest q wins
    q, t, y, n = min(candidates)
    print(f"q bits = {q.bit_length()}")
    print(f"q = {q:#x}")
    print(f"t = {t:#x}")
    print(f"y = {y:#x}")
    print(f"g1 cofactor = n // r = {n // r:#x}")

    # find curve coefficient b (j = 0: y^2 = x^3 + b)
    def find_b(order, field_p, xi_mul=1):
        for b in range(1, 10000):
            bb = b * xi_mul % field_p
            # lift x=1,2,... to a point
            for x in range(1, 40):
                rhs = (x * x * x + bb) % field_p
                if pow(rhs, (field_p - 1) // 2, field_p) != 1:
                    continue
                yy = tonelli(rhs, field_p)
                # check order: order * P == inf via simple double-and-add
                if ec_mul(x, yy, order, field_p, bb) is None:
                    # confirm not accidentally low order: r*P != inf unless
                    # order multiple
                    return bb, (x, yy)
                break
        return None, None

    def ec_mul(px, py, k, p, b):
        # affine double-and-add; returns None for infinity
        P = None
        Q = (px, py)
        while k:
            if k & 1:
                P = ec_add(P, Q, p)
            Q = ec_add(Q, Q, p)
            k >>= 1
        return P

    def ec_add(P, Q, p):
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2 and (y1 + y2) % p == 0:
            return None
        if P == Q:
            lam = (3 * x1 * x1) * pow(2 * y1, -1, p) % p
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    b, pt = find_b(n, q)
    print(f"b = {b}, sample point = {pt}")

    # non-residue xi for the tower: neither square nor cube mod q
    xi = 2
    while (pow(xi, (q - 1) // 2, q) == 1
           or pow(xi, (q - 1) // 3, q) == 1):
        xi += 1
    print(f"xi (sextic non-residue) = {xi}")

    # sextic twist orders: q + 1 - (t +- 3y)/2
    for sign, label in ((1, "+"), (-1, "-")):
        tw_t = (t + sign * 3 * y)
        if tw_t % 2 != 0:
            continue
        n_tw = q + 1 - tw_t // 2
        print(f"twist order (t{label}3y)/2: divisible by r: {n_tw % r == 0}"
              f" cofactor bits {(n_tw // r).bit_length() if n_tw % r == 0 else '-'}")
        if n_tw % r == 0:
            # which twist coefficient? try b*xi, b*xi^2, ..., b*xi^5, b/xi
            for e in (1, 2, 3, 4, 5):
                bb = b * pow(xi, e, q) % q
                _, pt2 = None, None
                for x in range(1, 60):
                    rhs = (x * x * x + bb) % q
                    if pow(rhs, (q - 1) // 2, q) != 1:
                        continue
                    yy = tonelli(rhs, q)
                    if ec_mul(x, yy, n_tw, q, bb) is None:
                        print(f"  twist coeff b*xi^{e} = works; "
                              f"G2 cofactor = {n_tw // r:#x}")
                        print(f"  twist sample point x={x}")
                        pt2 = (x, yy)
                    break
                if pt2:
                    break


if __name__ == "__main__":
    main()
