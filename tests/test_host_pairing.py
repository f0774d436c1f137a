"""Pairing correctness: non-degeneracy + bilinearity on both curves."""
import random

import pytest

from libsnark_tpu import get_curve


@pytest.mark.parametrize("name", ["alt_bn128", "bls12_377"])
def test_pairing_bilinear(name):
    curve = get_curve(name)
    rng = random.Random(7)
    P, Q = curve.G1.one(), curve.G2.one()
    e = curve.pairing(P, Q)
    assert e != curve.GT.one(), "pairing is degenerate"
    # e has order r
    from libsnark_tpu.fields import generic_pow
    assert generic_pow(e, curve.r) == curve.GT.one()

    a = rng.randrange(2, 1 << 64)
    b = rng.randrange(2, 1 << 64)
    eab = curve.pairing(P * a, Q * b)
    assert eab == generic_pow(e, a * b % curve.r)
    # mixed scaling
    assert curve.pairing(P * a, Q) == curve.pairing(P, Q * a)


@pytest.mark.parametrize("name", ["alt_bn128", "bls12_377"])
def test_pairing_check_product(name):
    curve = get_curve(name)
    P, Q = curve.G1.one(), curve.G2.one()
    # e(aP, Q) * e(-P, aQ) == 1
    a = 12345
    assert curve.pairing_check([(P * a, Q), (-P, Q * a)])
    assert not curve.pairing_check([(P * a, Q), (-P, Q * (a + 1))])
    # degenerate inputs
    assert curve.pairing(curve.G1.zero(), Q) == curve.GT.one()
