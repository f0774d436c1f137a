"""KZG10 commit/open/verify round-trip (reference
test_polynomial_commitments.cpp behavior)."""
import random

import pytest

from libsnark_tpu import get_curve
from libsnark_tpu.polynomial_commitments.kzg10 import KZG10


@pytest.fixture(scope="module")
def kzg_bn():
    return KZG10(get_curve("alt_bn128"))


def test_kzg10_commit_open_verify(kzg_bn):
    kzg = kzg_bn
    r = kzg.curve.r
    rng = random.Random(50)
    deg = 13
    srs = kzg.setup(deg, seed=3)
    coeffs = [rng.randrange(r) for _ in range(deg + 1)]
    C = kzg.commit(srs, coeffs)
    z = rng.randrange(r)
    v, W = kzg.create_evaluation_witness(srs, coeffs, z)
    assert v == kzg.evaluate_polynomial(coeffs, z, r)
    assert kzg.verify_evaluation(srs, C, z, v, W)
    # wrong value rejected
    assert not kzg.verify_evaluation(srs, C, z, (v + 1) % r, W)
    # wrong point rejected
    assert not kzg.verify_evaluation(srs, C, (z + 1) % r, v, W)
    assert kzg.verify_poly(srs, C, coeffs)
    bad = list(coeffs)
    bad[0] = (bad[0] + 1) % r
    assert not kzg.verify_poly(srs, C, bad)


def test_kzg10_commit_matches_host_msm(kzg_bn):
    kzg = kzg_bn
    r = kzg.curve.r
    rng = random.Random(51)
    srs = kzg.setup_from_secret(7, alpha=123456789)
    coeffs = [rng.randrange(r) for _ in range(8)]
    C = kzg.commit(srs, coeffs)
    # oracle: sum c_i alpha^i * G1
    want = kzg.curve.G1.one() * (
        sum(c * pow(123456789, i, r) for i, c in enumerate(coeffs)) % r)
    assert C.point == want
