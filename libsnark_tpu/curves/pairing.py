"""Host-side ate pairings for BN and BLS12 curve families.

Strategy: embed both pairing arguments into E(Fq12) through the sextic
(un)twist and run a generic affine Miller loop with line-function
evaluation, then final-exponentiate. This favors auditability over raw
speed -- pairings sit only on the verifier / setup paths (a handful per
proof; see reference r1cs_gg_ppzksnark.tcc:655-684), never on the TPU
prover hot path. Optimized sparse-line / cyclotomic versions can slot in
behind the same API later.

API parity targets (libff): precompute_G1/G2, miller_loop,
double_miller_loop, final_exponentiation, reduced_pairing
(use sites r1cs_gg_ppzksnark.tcc:613-675).
"""
from __future__ import annotations


class PairingEngine:
    """Ate pairing over a sextic-twisted curve.

    Parameters
    ----------
    curve : the Curve bundle (needs Fq12, G1, G2, twist type, loop count)
    """

    def __init__(self, Fq12, G1, G2, loop_count, family, twist_type="D",
                 loop_is_neg=False, r=None):
        self.Fq12 = Fq12
        self.G1 = G1
        self.G2 = G2
        self.loop_count = loop_count          # |6x+2| for BN, |x| for BLS
        self.loop_is_neg = loop_is_neg
        self.family = family                  # "bn" or "bls"
        self.twist_type = twist_type
        self.r = r
        q = Fq12.char
        # (q^12-1)/r = (q^6-1)(q^2+1) * hard ; hard = (q^4-q^2+1)/r
        assert (q ** 4 - q ** 2 + 1) % r == 0
        self._hard_exp = (q ** 4 - q ** 2 + 1) // r
        # w^2 and w^3 as Fq12 elements (w generates Fq12 over Fq2, w^6 = xi)
        Fq6 = Fq12.base_field
        Fq2 = Fq6.base_field
        self._w2 = Fq12(Fq6(Fq2.zero(), Fq2.one(), Fq2.zero()), Fq6.zero())
        self._w3 = Fq12(Fq6.zero(), Fq6(Fq2.zero(), Fq2.one(), Fq2.zero()))

    # -- embeddings ----------------------------------------------------------
    def embed_g1(self, P):
        """G1(Fq) point -> E(Fq12) affine coords."""
        if P.is_zero():
            return None
        Fq12 = self.Fq12
        Fq6 = Fq12.base_field
        Fq2 = Fq6.base_field
        lift = lambda a: Fq12(Fq6(Fq2(a, type(a)())))
        return (lift(P.x), lift(P.y))

    def embed_g2(self, Q):
        """G2 (on twist E'/Fq2) -> E(Fq12) via untwist."""
        if Q.is_zero():
            return None
        Fq12 = self.Fq12
        Fq6 = Fq12.base_field
        lift2 = lambda a: Fq12(Fq6(a))  # Fq2 element into Fq12 c0.c0
        if self.twist_type == "D":
            # E': y^2 = x^3 + b/xi ; psi(x,y) = (x w^2, y w^3)
            return (lift2(Q.x) * self._w2, lift2(Q.y) * self._w3)
        else:
            # M twist: E': y^2 = x^3 + b xi ; psi(x,y) = (x / w^2, y / w^3)
            return (lift2(Q.x) / self._w2, lift2(Q.y) / self._w3)

    # -- Miller machinery ------------------------------------------------------
    # Tangent slope is (3x^2 + a)/(2y); `_ea` holds the curve's a
    # coefficient embedded in the target field (None for a = 0 families;
    # the MNT engines set it -- MNT curves have generic j-invariant).
    _ea = None

    def _tangent_slope(self, x1, y1):
        num = x1 * x1 * 3
        if self._ea is not None:
            num = num + self._ea
        return num / (y1 + y1)

    def _line(self, P1, P2, T):
        """Evaluate the line through P1,P2 (or tangent if equal) at T.

        Points are (x, y) pairs over the target field.
        Returns a field element; vertical lines return x_T - x_P1.
        """
        x1, y1 = P1
        x2, y2 = P2
        xt, yt = T
        if x1 == x2 and y1 == y2:
            slope = self._tangent_slope(x1, y1)
        elif x1 == x2:
            return xt - x1
        else:
            slope = (y2 - y1) / (x2 - x1)
        return slope * (xt - x1) - (yt - y1)

    def _add(self, P1, P2):
        x1, y1 = P1
        x2, y2 = P2
        if x1 == x2 and y1 == y2:
            slope = self._tangent_slope(x1, y1)
        elif x1 == x2:
            return None  # infinity
        else:
            slope = (y2 - y1) / (x2 - x1)
        x3 = slope * slope - x1 - x2
        y3 = slope * (x1 - x3) - y1
        return (x3, y3)

    def miller_loop(self, embQ, embP, with_final_steps=True):
        """f_{loop,Q}(P); embQ/embP are embedded E(Fq12) affine pairs."""
        Fq12 = self.Fq12
        if embQ is None or embP is None:
            return Fq12.one()
        Q, P = embQ, embP
        R = Q
        f = Fq12.one()
        n = self.loop_count
        for i in range(n.bit_length() - 2, -1, -1):
            f = f * f * self._line(R, R, P)
            R = self._add(R, R)
            if (n >> i) & 1:
                f = f * self._line(R, Q, P)
                R = self._add(R, Q)
        if self.loop_is_neg:
            # f_{-n} = 1/f_n (up to vertical lines killed by final exp)
            f = f.inverse()
            R = (R[0], -R[1])
        if self.family == "bn" and with_final_steps:
            # frobenius twists: Q1 = pi_q(Q), Q2 = pi_q^2(Q)
            Q1 = (Q[0].frobenius(1), Q[1].frobenius(1))
            Q2 = (Q[0].frobenius(2), Q[1].frobenius(2))
            f = f * self._line(R, Q1, P)
            R = self._add(R, Q1)
            nQ2 = (Q2[0], -Q2[1])
            f = f * self._line(R, nQ2, P)
            R = self._add(R, nQ2)
        return f

    def double_miller_loop(self, embQ1, embP1, embQ2, embP2):
        """Product of two Miller loops (libff double_miller_loop parity)."""
        return (self.miller_loop(embQ1, embP1) *
                self.miller_loop(embQ2, embP2))

    def final_exponentiation(self, f):
        """f^((q^12-1)/r): easy part by frobenius, hard part by direct pow."""
        # easy: f^(q^6-1) then ^(q^2+1)
        m = f.frobenius(6) * f.inverse()          # f^(q^6-1)
        m = m.frobenius(2) * m                    # ^(q^2+1)
        # hard: ^((q^4-q^2+1)/r)
        return m ** self._hard_exp

    # -- public API -------------------------------------------------------------
    def pairing(self, P, Q):
        """Reduced ate pairing e(P, Q), P in G1, Q in G2."""
        if P.is_zero() or Q.is_zero():
            return self.Fq12.one()
        f = self.miller_loop(self.embed_g2(Q), self.embed_g1(P))
        return self.final_exponentiation(f)

    reduced_pairing = pairing

    def pairing_check(self, pairs):
        """prod e(Pi, Qi) == 1 check, single final exponentiation."""
        f = self.Fq12.one()
        for P, Q in pairs:
            if P.is_zero() or Q.is_zero():
                continue
            f = f * self.miller_loop(self.embed_g2(Q), self.embed_g1(P))
        return self.final_exponentiation(f) == self.Fq12.one()


class W6PairingEngine(PairingEngine):
    """Ate pairing for embedding-degree-6 curves with G2 on a sextic
    twist over Fq itself (the BW6-761 / Cocks-Pinch-k6 shape used for
    one-layer proof composition; reference
    gadgetlib1/gadgets/pairing/bw6_761_bls12_377/).

    GT lives in Fq6 = Fq3[w]/(w^2 - v), Fq3 = Fq[v]/(v^3 - xi).
    Miller loop count = t - 1 (generic ate); final exponentiation
    (q^6-1)/r = (q^3-1)(q+1) * (q^2-q+1)/r.
    """

    def __init__(self, Fq6, G1, G2, trace, r, twist_type="M"):
        self.Fq12 = Fq6                  # the "target field" slot
        self.G1 = G1
        self.G2 = G2
        self.loop_count = trace - 1
        self.loop_is_neg = False
        self.family = "w6"
        self.twist_type = twist_type
        self.r = r
        q = Fq6.char
        assert (q * q - q + 1) % r == 0
        self._hard_exp = (q * q - q + 1) // r
        Fq3 = Fq6.base_field
        v = Fq3(Fq3.base_field.zero(), Fq3.base_field.one(),
                Fq3.base_field.zero())
        self._w2 = Fq6(v, Fq3.zero())          # w^2 = v
        self._w3 = Fq6(Fq3.zero(), v)          # w^3 = v * w

    def embed_g1(self, P):
        if P.is_zero():
            return None
        Fq6 = self.Fq12
        Fq3 = Fq6.base_field
        lift = lambda a: Fq6(Fq3(a))
        return (lift(P.x), lift(P.y))

    def embed_g2(self, Q):
        """G2 on twist E'/Fq -> E(Fq6); M: (x/w^2, y/w^3)."""
        if Q.is_zero():
            return None
        Fq6 = self.Fq12
        Fq3 = Fq6.base_field
        lift = lambda a: Fq6(Fq3(a))
        if self.twist_type == "M":
            return (lift(Q.x) / self._w2, lift(Q.y) / self._w3)
        return (lift(Q.x) * self._w2, lift(Q.y) * self._w3)

    def final_exponentiation(self, f):
        m = f.frobenius(3) * f.inverse()          # ^(q^3-1)
        m = m.frobenius(1) * m                    # ^(q+1)
        return m ** self._hard_exp                # ^((q^2-q+1)/r)


class MNT4PairingEngine(PairingEngine):
    """Ate pairing for MNT4 (k=4, generic j-invariant, quadratic twist).

    Reference surface: libff mnt4 pairing (the reference's MNT4-based
    PCD default, common/default_types/r1cs_ppzkpcd_pp.hpp:27-38).
    GT in Fq4 = Fq2[w]/(w^2 - u), u = (0,1) in Fq2 = Fq[u]/(u^2 - nr).
    G2 on the u-quadratic twist E'/Fq2: y^2 = x^3 + a*nr*x + (0, b*nr);
    untwist psi(x, y) = (x/w^2, y/w^3). Miller loop count = t - 1 (ate);
    final exponentiation (q^4-1)/r = (q^2-1) * (q^2+1)/r.
    """

    def __init__(self, Fq4, G1, G2, trace, r, curve_a: int):
        self.Fq12 = Fq4                  # target-field slot
        self.G1 = G1
        self.G2 = G2
        T = trace - 1
        self.loop_count = abs(T)
        self.loop_is_neg = T < 0
        self.family = "mnt4"
        self.twist_type = "M"
        self.r = r
        q = Fq4.char
        assert (q * q + 1) % r == 0      # r | Phi_4(q)
        self._hard_exp = (q * q + 1) // r
        Fq2 = Fq4.base_field
        u = Fq2(Fq2.base_field.zero(), Fq2.base_field.one())
        self._w2 = Fq4(u, Fq2.zero())          # w^2 = u
        self._w3 = Fq4(Fq2.zero(), u)          # w^3 = u * w
        self._ea = Fq4(Fq2(Fq2.base_field(curve_a)))  # E's a, embedded

    def embed_g1(self, P):
        if P.is_zero():
            return None
        Fq4 = self.Fq12
        Fq2 = Fq4.base_field
        lift = lambda c: Fq4(Fq2(c))
        return (lift(P.x), lift(P.y))

    def embed_g2(self, Q):
        """G2 on twist E'/Fq2 -> E(Fq4): (x/w^2, y/w^3)."""
        if Q.is_zero():
            return None
        Fq4 = self.Fq12
        lift = lambda c: Fq4(c)
        return (lift(Q.x) / self._w2, lift(Q.y) / self._w3)

    def final_exponentiation(self, f):
        m = f.frobenius(2) * f.inverse()          # ^(q^2-1)
        return m ** self._hard_exp                # ^((q^2+1)/r)


class MNT6PairingEngine(PairingEngine):
    """Ate pairing for MNT6 (k=6, generic j-invariant, quadratic twist
    over Fq3). GT in Fq6 = Fq3[w]/(w^2 - v), v = (0,1,0) in
    Fq3 = Fq[v]/(v^3 - nr). G2 on the v-quadratic twist E'/Fq3:
    y^2 = x^3 + (0,0,a)x + (b*nr,0,0); untwist (x/w^2, y/w^3).
    Miller loop = |t - 1|; final exp (q^6-1)/r with the W6 split.
    """

    def __init__(self, Fq6, G1, G2, trace, r, curve_a: int):
        self.Fq12 = Fq6
        self.G1 = G1
        self.G2 = G2
        T = trace - 1
        self.loop_count = abs(T)
        self.loop_is_neg = T < 0
        self.family = "mnt6"
        self.twist_type = "M"
        self.r = r
        q = Fq6.char
        assert (q * q - q + 1) % r == 0  # r | Phi_6(q)
        self._hard_exp = (q * q - q + 1) // r
        Fq3 = Fq6.base_field
        Fq = Fq3.base_field
        v = Fq3(Fq.zero(), Fq.one(), Fq.zero())
        self._w2 = Fq6(v, Fq3.zero())          # w^2 = v
        self._w3 = Fq6(Fq3.zero(), v)          # w^3 = v * w
        self._ea = Fq6(Fq3(Fq(curve_a)))

    def embed_g1(self, P):
        if P.is_zero():
            return None
        Fq6 = self.Fq12
        Fq3 = Fq6.base_field
        lift = lambda c: Fq6(Fq3(c))
        return (lift(P.x), lift(P.y))

    def embed_g2(self, Q):
        """G2 on twist E'/Fq3 -> E(Fq6): (x/w^2, y/w^3)."""
        if Q.is_zero():
            return None
        Fq6 = self.Fq12
        return (Fq6(Q.x) / self._w2, Fq6(Q.y) / self._w3)

    def final_exponentiation(self, f):
        m = f.frobenius(3) * f.inverse()          # ^(q^3-1)
        m = m.frobenius(1) * m                    # ^(q+1)
        return m ** self._hard_exp                # ^((q^2-q+1)/r)
