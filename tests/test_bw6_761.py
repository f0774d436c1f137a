"""BW6-761 outer curve: construction, pairing bilinearity, and the
one-layer composition property Fr(BW6) == Fq(BLS12-377)."""
import pytest


@pytest.fixture(scope="module")
def bw6():
    from libsnark_tpu import get_curve
    return get_curve("bw6_761")


def test_field_chain(bw6):
    from libsnark_tpu import get_curve
    bls = get_curve("bls12_377")
    assert bw6.r == bls.q, "outer scalar field must equal inner base field"
    assert bw6.q.bit_length() == 761


def test_generators(bw6):
    G1, G2 = bw6.G1.one(), bw6.G2.one()
    assert G1.is_well_formed() and G2.is_well_formed()
    assert G1.mul_unreduced(bw6.r).is_zero()
    assert G2.mul_unreduced(bw6.r).is_zero()


@pytest.mark.slow
def test_pairing_bilinearity(bw6):
    G1, G2 = bw6.G1.one(), bw6.G2.one()
    e = bw6.pairing(G1, G2)
    assert e != bw6.GT.one()
    assert e ** bw6.r == bw6.GT.one()
    assert bw6.pairing(G1 * 3, G2 * 11) == e ** 33
    assert bw6.pairing_check([(G1 * 6, G2), (-(G1 * 2), G2 * 3)])
