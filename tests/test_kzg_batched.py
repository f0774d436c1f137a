"""Batched KZG (2-point) and BDFG21 tests (reference
test_polynomial_commitments.cpp cases over small polynomials)."""
import pytest

from libsnark_tpu.polynomial_commitments.kzg10 import KZG10
from libsnark_tpu.polynomial_commitments.kzg10_batched import (
    KZG10Batched2Point)
from libsnark_tpu.polynomial_commitments.bdfg21 import BDFG21


@pytest.fixture(scope="module")
def kzg(request):
    from libsnark_tpu import get_curve
    return KZG10(get_curve("alt_bn128"))


@pytest.fixture(scope="module")
def srs(kzg):
    return kzg.setup(15, seed=42)


def test_kzg10_batched_2_point(kzg, srs):
    r = kzg.curve.r
    fs = [[1, 2, 3, 4], [5, 0, 7], [9, 8, 7, 6, 5]]
    gs = [[11, 12], [13, 0, 0, 15]]
    z_1, z_2 = 0xAA1, 0xBB2
    gamma_1, gamma_2 = 0xC01, 0xD02
    batched = KZG10Batched2Point(kzg)
    evals = batched.evaluate_polynomials(fs, gs, z_1, z_2)
    cm_1s = [kzg.commit(srs, f) for f in fs]
    cm_2s = [kzg.commit(srs, g) for g in gs]
    wit = batched.create_evaluation_witness(
        fs, gs, z_1, z_2, evals, srs, gamma_1, gamma_2)
    assert batched.verify_evaluations(
        z_1, z_2, evals, srs, gamma_1, gamma_2, wit, cm_1s, cm_2s,
        r_rand=0xE03)
    # corrupt an evaluation
    bad = type(evals)(s_1s=[(evals.s_1s[0] + 1) % r] + evals.s_1s[1:],
                      s_2s=evals.s_2s)
    assert not batched.verify_evaluations(
        z_1, z_2, bad, srs, gamma_1, gamma_2, wit, cm_1s, cm_2s,
        r_rand=0xE03)


def test_bdfg21(kzg, srs):
    r = kzg.curve.r
    f_sets = [[[1, 2, 3], [4, 5, 6, 7]],
              [[8, 9], [10, 11, 12]]]
    T = [0x111, 0x222]
    gamma, z = 0x333, 0x444
    b = BDFG21(kzg)
    evals = b.evaluate_polynomials(f_sets, T)
    cm_sets = [[kzg.commit(srs, f) for f in fset] for fset in f_sets]
    ph1 = b.create_evaluation_witness_phase_1(f_sets, T, evals, srs, gamma)
    wit = b.create_evaluation_witness(f_sets, T, evals, srs, gamma, ph1, z)
    assert b.verify_evaluations(T, evals, srs, gamma, z, wit, cm_sets)
    # tamper
    bad = [list(e) for e in evals]
    bad[0][0] = (bad[0][0] + 1) % r
    assert not b.verify_evaluations(T, bad, srs, gamma, z, wit, cm_sets)
