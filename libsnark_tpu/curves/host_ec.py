"""Host-side elliptic curve groups over arbitrary host fields.

Short Weierstrass y^2 = x^3 + a x + b, points in affine-or-infinity form.
Mirrors the libff G1/G2 group API consumed by the reference proof systems
(add, dbl, mixed_add, scalar mul, is_well_formed, zero/one; see
r1cs_gg_ppzksnark.tcc:342-353 use sites). Host side is the oracle + the
low-throughput path (verifier, setup secrets); batched TPU group ops live
in libsnark_tpu/ops/ec.py.
"""
from __future__ import annotations

from ..fields import generic_pow


class ECGroup:
    """A short-Weierstrass group over host field `F` with coefficients a, b."""

    def __init__(self, F, a, b, name="G", cofactor=1, order=None, generator=None):
        self.F = F
        self.a = a if not isinstance(a, int) else F.from_int(a)
        self.b = b if not isinstance(b, int) else F.from_int(b)
        self.name = name
        self.cofactor = cofactor
        self.order = order          # prime subgroup order r
        self._generator = generator  # (x, y) tuple of F elements

    # -- point constructors --------------------------------------------------
    def zero(self):
        return ECPoint(self, None, None)

    def point(self, x, y):
        x = x if not isinstance(x, int) else self.F.from_int(x)
        y = y if not isinstance(y, int) else self.F.from_int(y)
        return ECPoint(self, x, y)

    def one(self):
        """The fixed subgroup generator."""
        x, y = self._generator
        return self.point(x, y)

    def is_on_curve(self, x, y):
        return y * y == x * x * x + self.a * x + self.b

    def random_element(self, rng=None):
        import random as _random
        rng = rng or _random
        return self.one() * rng.randrange(1, self.order)

    def from_list(self, xs, infinity=False):
        if infinity:
            return self.zero()
        h = len(xs) // 2
        return self.point(self.F.from_list(xs[:h]), self.F.from_list(xs[h:]))


class ECPoint:
    """Affine point (or infinity) with operator arithmetic."""

    __slots__ = ("group", "x", "y")

    def __init__(self, group, x, y):
        self.group = group
        self.x = x
        self.y = y

    def is_zero(self):
        return self.x is None

    def is_well_formed(self):
        if self.is_zero():
            return True
        return self.group.is_on_curve(self.x, self.y)

    def in_subgroup(self):
        return (self * self.group.order).is_zero()

    def __neg__(self):
        if self.is_zero():
            return self
        return ECPoint(self.group, self.x, -self.y)

    def __add__(self, o):
        if self.is_zero():
            return o
        if o.is_zero():
            return self
        if self.x == o.x:
            if self.y == o.y:
                return self.dbl()
            return self.group.zero()
        lam = (o.y - self.y) / (o.x - self.x)
        x3 = lam * lam - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return ECPoint(self.group, x3, y3)

    def __sub__(self, o):
        return self + (-o)

    def dbl(self):
        if self.is_zero():
            return self
        if self.y.is_zero():
            return self.group.zero()
        three = self.group.F.from_int(3)
        lam = (three * self.x * self.x + self.group.a) / (self.y + self.y)
        x3 = lam * lam - self.x - self.x
        y3 = lam * (self.x - x3) - self.y
        return ECPoint(self.group, x3, y3)

    def __mul__(self, k: int):
        """Scalar multiplication. NOTE: reduces k mod the subgroup order
        -- only sound for points INSIDE the order-r subgroup. Cofactor
        clearing must use mul_unreduced."""
        k = int(k)
        if self.group.order is not None:
            k %= self.group.order
        return self.mul_unreduced(k)

    def mul_unreduced(self, k: int):
        """Scalar multiplication without order reduction (for cofactor
        clearing / points of unknown order)."""
        k = int(k)
        if k < 0:
            return (-self).mul_unreduced(-k)
        if k == 0 or self.is_zero():
            return self.group.zero()
        acc = self.group.zero()
        add = self
        while k:
            if k & 1:
                acc = acc + add
            add = add.dbl()
            k >>= 1
        return acc

    __rmul__ = __mul__

    def __eq__(self, o):
        if not isinstance(o, ECPoint):
            return NotImplemented
        if self.is_zero() or o.is_zero():
            return self.is_zero() and o.is_zero()
        return self.x == o.x and self.y == o.y

    def __hash__(self):
        if self.is_zero():
            return hash((self.group.name, "inf"))
        return hash((self.group.name, self.x, self.y))

    def __repr__(self):
        if self.is_zero():
            return f"{self.group.name}(inf)"
        return f"{self.group.name}({self.x!r}, {self.y!r})"

    def to_list(self):
        """Flatten to base-prime-field ints; infinity flag handled by caller."""
        if self.is_zero():
            return None
        return self.x.to_list() + self.y.to_list()


def multi_scalar_mul(points, scalars):
    """Naive host MSM (oracle for the TPU Pippenger kernel)."""
    acc = points[0].group.zero()
    for p, s in zip(points, scalars):
        acc = acc + p * int(s)
    return acc


def find_point_from_x(group, x):
    """Deterministically lift x (host int) to a curve point if possible."""
    F = group.F
    while True:
        xf = F.from_int(x)
        rhs = xf * xf * xf + group.a * xf + group.b
        try:
            y = rhs.sqrt()
            return group.point(xf, y)
        except ValueError:
            x += 1


def find_wnaf(window_size: int, scalar: int):
    """Width-w non-adjacent form of a non-negative scalar: digit list,
    LSB first, each digit odd in (-2^w, 2^w) or zero (libff
    libff/algebra/scalar_multiplication/wnaf.tcc find_wnaf parity)."""
    assert scalar >= 0
    res = []
    k = scalar
    full = 1 << (window_size + 1)
    while k > 0:
        if k & 1:
            d = k % full
            if d >= full // 2:
                d -= full
            k -= d
        else:
            d = 0
        res.append(d)
        k >>= 1
    return res


def wnaf_mul(point, scalar: int, window_size: int = None):
    """Fixed-window wNAF scalar multiplication (libff
    fixed_window_wnaf_exp / opt_window_wnaf_exp equivalent): precompute
    odd multiples P, 3P, .., (2^w - 1)P, then one double per bit and one
    add per ~(w+1) bits."""
    if scalar == 0:
        return point.group.zero()
    neg = scalar < 0
    scalar = abs(scalar)
    if window_size is None:
        # libff opt_window_wnaf_exp-style size heuristic
        b = scalar.bit_length()
        window_size = 2 if b < 16 else (3 if b < 64 else
                                        (4 if b < 256 else 5))
    digits = find_wnaf(window_size, scalar)
    # odd multiples table: tbl[i] = (2i+1) P
    dbl = point.dbl()
    tbl = [point]
    for _ in range((1 << window_size) - 1):
        tbl.append(tbl[-1] + dbl)
    acc = point.group.zero()
    for d in reversed(digits):
        acc = acc.dbl()
        if d > 0:
            acc = acc + tbl[(d - 1) // 2]
        elif d < 0:
            acc = acc - tbl[(-d - 1) // 2]
    return -acc if neg else acc
