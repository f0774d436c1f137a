"""Host field tower + curve constant sanity (the oracle must be right)."""
import random

import pytest

from libsnark_tpu import get_curve
from libsnark_tpu.fields import generic_pow


CURVES = ["alt_bn128", "bls12_377"]


@pytest.fixture(params=CURVES, scope="module")
def curve(request):
    return get_curve(request.param)


def test_prime_field_axioms(curve, rng=random.Random(1)):
    F = curve.Fr
    for _ in range(20):
        a, b, c = (F.random_element(rng) for _ in range(3))
        assert a + b == b + a
        assert (a + b) + c == a + (b + c)
        assert a * (b + c) == a * b + a * c
        if not a.is_zero():
            assert a * a.inverse() == F.one()
        assert a - a == F.zero()
        assert a ** 5 == a * a * a * a * a


@pytest.mark.parametrize("tower", ["Fq2", "Fq6", "Fq12"])
def test_extension_field_axioms(curve, tower):
    rng = random.Random(2)
    F = getattr(curve, tower)
    for _ in range(5):
        a, b, c = (F.random_element(rng) for _ in range(3))
        assert (a + b) * c == a * c + b * c
        assert a.squared() == a * a
        if not a.is_zero():
            assert a * a.inverse() == F.one()
        # frobenius is the q-power map
        assert a.frobenius(1) == generic_pow(a, F.char)


def test_frobenius_order(curve):
    rng = random.Random(3)
    a = curve.Fq12.random_element(rng)
    f = a
    for _ in range(12):
        f = f.frobenius(1)
    assert f == a
    assert a.frobenius(2) == a.frobenius(1).frobenius(1)
    assert a.frobenius(6) == a.conjugate() or curve.Fq12.degree != 12


def test_fr_two_adic_root(curve):
    p = curve.fr_params
    assert p.two_adicity >= 28  # enough for 2^20-constraint domains
    w = pow(p.root_of_unity, 1 << (p.two_adicity - 1), curve.r)
    assert w == curve.r - 1  # order exactly 2^two_adicity


def test_generators_on_curve_and_in_subgroup(curve):
    G1, G2 = curve.G1.one(), curve.G2.one()
    assert G1.is_well_formed() and G2.is_well_formed()
    assert (G1 * curve.r).is_zero()
    assert (G2 * curve.r).is_zero()
    assert not curve.generator_derived, \
        f"{curve.name}: hardcoded generator constants failed validation"


def test_group_law(curve):
    rng = random.Random(4)
    for G in (curve.G1, curve.G2):
        P = G.one() * rng.randrange(1, curve.r)
        Q = G.one() * rng.randrange(1, curve.r)
        assert P + Q == Q + P
        assert P + G.zero() == P
        assert (P - P).is_zero()
        assert P.dbl() == P + P
        a, b = rng.randrange(curve.r), rng.randrange(curve.r)
        assert P * a + P * b == P * ((a + b) % curve.r)


def test_wnaf_mul():
    """wNAF exponentiation vs plain double-and-add (libff wnaf.tcc)."""
    import random
    from libsnark_tpu import get_curve
    from libsnark_tpu.curves.host_ec import wnaf_mul, find_wnaf
    bn = get_curve("alt_bn128")
    rng = random.Random(11)
    G = bn.G1.one()
    for w in (2, 3, 4):
        for _ in range(3):
            k = rng.randrange(bn.r)
            assert wnaf_mul(G, k, w) == G * k
            # NAF reconstructs the scalar
            assert sum(d << i for i, d in enumerate(find_wnaf(w, k))) == k
    assert wnaf_mul(G, 0).is_zero()
    assert wnaf_mul(G, -5) == -(G * 5)
    # default window heuristic
    assert wnaf_mul(G, 123456789) == G * 123456789
