"""Curve bundle: fields, groups, pairing, and TPU limb parameters.

The reference selects curves at *compile time* (-DCURVE_*, see reference
CMakeLists.txt:23-29 and common/default_types). Here a curve is a runtime
object fetched by name -- one binary, every curve.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

from ..fields import make_prime_field, make_quadratic_ext, make_cubic_ext
from .host_ec import ECGroup, find_point_from_x
from .pairing import PairingEngine


LIMB_BITS = 16  # radix for packed-limb device arithmetic (uint32 lanes)


def n_limbs(p: int) -> int:
    """Limbs needed for modulus p at the device radix."""
    return -(-p.bit_length() // LIMB_BITS)


@dataclasses.dataclass
class FieldParams:
    """Static per-prime-field constants needed by the device kernels."""
    p: int
    num_limbs: int
    R: int              # Montgomery radix 2^(16*num_limbs) mod p
    R2: int             # R^2 mod p
    R3: int
    n0inv: int          # -p^-1 mod 2^16
    two_adicity: int = 0
    root_of_unity: int = 0        # generator of the 2^two_adicity subgroup
    multiplicative_generator: int = 0

    @classmethod
    def build(cls, p: int, mult_gen: Optional[int] = None):
        nl = n_limbs(p)
        R = pow(2, LIMB_BITS * nl, p)
        n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # two-adicity of p-1
        t, s = p - 1, 0
        while t % 2 == 0:
            t //= 2
            s += 1
        root = 0
        if mult_gen is not None:
            root = pow(mult_gen, (p - 1) >> s, p)
            assert pow(root, 1 << s, p) == 1
            assert pow(root, 1 << (s - 1), p) != 1, "mult_gen is not a generator"
        return cls(p=p, num_limbs=nl, R=R, R2=R * R % p, R3=R * R * R % p,
                   n0inv=n0inv, two_adicity=s, root_of_unity=root,
                   multiplicative_generator=mult_gen or 0)


class Curve:
    """Bundle of host fields/groups/pairing + device params for one curve."""

    def __init__(self, name, x_param, family, q, r, b, g1_gen,
                 fq2_non_residue, fq6_non_residue_c, twist_type,
                 g2_gen=None, fr_mult_gen=None, fq_mult_gen=None,
                 g1_cofactor=1, g2_cofactor=None, loop_count=None,
                 loop_is_neg=False):
        self.name = name
        self.family = family
        self.x_param = x_param
        self.q = q
        self.r = r
        self.twist_type = twist_type
        self.g1_cofactor = g1_cofactor
        self.g2_cofactor = g2_cofactor

        # --- host fields -----------------------------------------------------
        self.Fq = make_prime_field(q, f"{name}.Fq")
        self.Fr = make_prime_field(r, f"{name}.Fr")
        self.Fq2 = make_quadratic_ext(self.Fq, self.Fq(fq2_non_residue),
                                      f"{name}.Fq2")
        # Fq6 = Fq2[v]/(v^3 - xi)
        self.xi = self.Fq2(*fq6_non_residue_c)
        self.Fq6 = make_cubic_ext(self.Fq2, self.xi, f"{name}.Fq6")
        # Fq12 = Fq6[w]/(w^2 - v)
        v = self.Fq6(self.Fq2.zero(), self.Fq2.one(), self.Fq2.zero())
        self.Fq12 = make_quadratic_ext(self.Fq6, v, f"{name}.Fq12")
        self.GT = self.Fq12

        # --- groups -----------------------------------------------------------
        self.G1 = ECGroup(self.Fq, 0, self.Fq(b), f"{name}.G1",
                          cofactor=g1_cofactor, order=r, generator=g1_gen)
        if twist_type == "D":
            b2 = self.Fq2.from_int(b) / self.xi
        else:
            b2 = self.Fq2.from_int(b) * self.xi
        self.b = self.Fq(b)
        self.b2 = b2
        self.G2 = ECGroup(self.Fq2, self.Fq2.zero(), b2, f"{name}.G2",
                          cofactor=g2_cofactor, order=r, generator=None)
        self.generator_derived = False
        if g2_gen is not None:
            xg = self.Fq2(*g2_gen[0])
            yg = self.Fq2(*g2_gen[1])
            if self.G2.is_on_curve(xg, yg):
                self.G2._generator = (xg, yg)
        if self.G2._generator is None:
            self._derive_g2_generator()
        # validate G1 generator
        x1, y1 = self.Fq(g1_gen[0]), self.Fq(g1_gen[1])
        if not self.G1.is_on_curve(x1, y1):
            self._derive_g1_generator()
        else:
            self.G1._generator = (x1, y1)

        # --- pairing -----------------------------------------------------------
        if loop_count is None:
            if family == "bn":
                loop_count = abs(6 * x_param + 2)
                loop_is_neg = (6 * x_param + 2) < 0
            else:
                loop_count = abs(x_param)
                loop_is_neg = x_param < 0
        self.pairing_engine = PairingEngine(
            self.Fq12, self.G1, self.G2, loop_count, family,
            twist_type=twist_type, loop_is_neg=loop_is_neg, r=r)

        # --- device params ------------------------------------------------------
        self.fq_params = FieldParams.build(q, fq_mult_gen)
        self.fr_params = FieldParams.build(r, fr_mult_gen)

    # ------------------------------------------------------------------------
    def _derive_g1_generator(self):
        P = find_point_from_x(self.G1, 1)
        P = P.mul_unreduced(self.g1_cofactor)
        assert not P.is_zero() and P.mul_unreduced(self.r).is_zero()
        self.G1._generator = (P.x, P.y)
        self.generator_derived = True

    def _derive_g2_generator(self):
        assert self.g2_cofactor is not None, \
            f"{self.name}: no valid G2 generator and no cofactor to derive one"
        x = self.Fq2.from_int(1)
        one = self.Fq2.one()
        while True:
            rhs = x * x * x + self.b2
            try:
                y = rhs.sqrt()
                Q = self.G2.point(x, y).mul_unreduced(self.g2_cofactor)
                if not Q.is_zero() and Q.mul_unreduced(self.r).is_zero():
                    self.G2._generator = (Q.x, Q.y)
                    self.generator_derived = True
                    return
            except ValueError:
                pass
            x = x + one

    # -- conveniences ------------------------------------------------------------
    def pairing(self, P, Q):
        return self.pairing_engine.pairing(P, Q)

    def pairing_check(self, pairs):
        return self.pairing_engine.pairing_check(pairs)

    def __repr__(self):
        return f"Curve({self.name})"
