"""The "edwards" curve (curves/edwards.py; reference libff edwards_pp,
used by several default_types configurations): structural verification
of the re-stated parameters, the Edwards-form complete addition law,
the birational maps, and the k=6 ate pairing."""
import random

import pytest

from libsnark_tpu.curves import get_curve, available_curves
from libsnark_tpu.curves.edwards import (Q, R, D, TRACE, MONT_A, MONT_B,
                                         A4, A6)


@pytest.fixture(scope="module")
def ed():
    return get_curve("edwards")


def test_structure():
    import sympy
    assert Q.bit_length() == 183 and R.bit_length() == 181
    assert sympy.isprime(Q) and sympy.isprime(R)
    assert Q + 1 - TRACE == 4 * R                 # cofactor-4 order
    assert (Q * Q - Q + 1) % R == 0               # embedding degree 6
    for k in (1, 2, 3):                           # ... and not less
        assert (Q ** k - 1) % R != 0
    assert pow(D, (Q - 1) // 2, Q) == Q - 1       # d non-square
    # Edwards -> Montgomery -> Weierstrass chain consistency
    assert MONT_A == 2 * (1 + D) * pow(1 - D, -1, Q) % Q
    assert A4 == (3 - MONT_A ** 2) * pow(3 * MONT_B ** 2, -1, Q) % Q


def test_registry():
    assert "edwards" in available_curves()
    assert get_curve("edwards").name == "edwards"


def test_group_orders(ed):
    P = ed.G1.one()
    assert not P.is_zero()
    assert P.mul_unreduced(ed.r).is_zero()
    Q2 = ed.G2.one()
    assert not Q2.is_zero()
    assert Q2.mul_unreduced(ed.r).is_zero()


def test_edwards_complete_addition(ed):
    E = ed.edwards
    p1 = E.random_point(7)
    p2 = E.random_point(12345)
    assert E.is_on_curve(p1) and E.is_on_curve(p2)
    s = E.add(p1, p2)
    assert E.is_on_curve(s)
    # unified doubling (no special case)
    dbl = E.add(p1, p1)
    assert dbl == E.mul(p1, 2)
    # identity / inverse under the SAME formula
    assert E.add(p1, E.identity) == p1
    assert E.add(p1, E.neg(p1)) == E.identity
    # exceptional low-order points under the same formula
    order2 = (0, Q - 1)
    order4 = (1, 0)
    assert E.is_on_curve(order2) and E.is_on_curve(order4)
    assert E.add(order4, order4) == order2
    assert E.add(order2, order2) == E.identity
    # full group order
    assert E.mul(p1, 4 * R) == E.identity


def test_birational_map_isomorphism(ed):
    E = ed.edwards
    rng = random.Random(3)
    for seed in (5, 999, 271828):
        p1 = E.random_point(seed)
        p2 = E.random_point(seed + 10 ** 9)
        lhs = E.to_weierstrass(E.add(p1, p2))
        rhs = E.to_weierstrass(p1) + E.to_weierstrass(p2)
        assert lhs == rhs
        assert E.from_weierstrass(E.to_weierstrass(p1)) == p1
    # exceptional points
    assert E.to_weierstrass(E.identity).is_zero()
    w2 = E.to_weierstrass((0, Q - 1))
    assert (w2 + w2).is_zero() and not w2.is_zero()
    assert E.from_weierstrass(w2) == (0, Q - 1)
    k = rng.randrange(1, R)
    p = E.random_point(42)
    assert E.to_weierstrass(E.mul(p, k)) == \
        E.to_weierstrass(p).mul_unreduced(k)


def test_pairing_bilinear(ed):
    rng = random.Random(1)
    a, b = rng.randrange(1, ed.r), rng.randrange(1, ed.r)
    P, Q2 = ed.G1.one(), ed.G2.one()
    e = ed.pairing(P, Q2)
    assert e != ed.GT.one()
    assert e ** ed.r == ed.GT.one()
    assert ed.pairing(P.mul_unreduced(a), Q2.mul_unreduced(b)) == \
        e ** (a * b % ed.r)
    # pairing product check surface
    aP = P.mul_unreduced(a)
    assert ed.pairing_check([(aP, Q2), (-P, Q2.mul_unreduced(a))])


def test_field_params(ed):
    assert ed.fr_params.two_adicity >= 31    # radix-2 domains to 2^31
    assert ed.fq_params.p == Q and ed.fr_params.p == R
