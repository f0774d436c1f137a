"""Field tower gadgets vs the host tower oracle (reference pattern:
gadgetlib1/tests/test_fields gadgets compare in-circuit vs libff)."""
import pytest

from libsnark_tpu.gadgets.protoboard import Protoboard
from libsnark_tpu.gadgets.fields_gadgets import (
    Fp2Gadgets, Fp6Gadgets, Fp12Gadgets)


@pytest.fixture(scope="module")
def setup(bls377):
    # circuit field = Fq(BLS12-377) (= Fr(BW6-761))
    pb = Protoboard(bls377.q)
    fp2 = Fp2Gadgets(pb, int(bls377.Fq2.NON_RESIDUE))
    fp6 = Fp6Gadgets(fp2, bls377.xi)
    fp12 = Fp12Gadgets(fp6, bls377.Fq12)
    return pb, fp2, fp6, fp12, bls377


def _rand2(F2, rng):
    return F2(rng.randrange(F2.modulus), rng.randrange(F2.modulus))


def _rand12(F12, rng):
    F6 = F12.base_field
    F2 = F6.base_field
    return F12(F6(*[_rand2(F2, rng) for _ in range(3)]),
               F6(*[_rand2(F2, rng) for _ in range(3)]))


def test_fp2_ops(setup, rng):
    pb, fp2, fp6, fp12, c = setup
    F2 = c.Fq2
    a_host, b_host = _rand2(F2, rng), _rand2(F2, rng)
    a, _ = fp2.alloc_input(a_host)
    b, _ = fp2.alloc_input(b_host)
    m = fp2.mul(a, b)
    s = fp2.sqr(a)
    i = fp2.inv(b)
    fp2.generate_witness()
    assert fp2.eval(m, F2) == a_host * b_host
    assert fp2.eval(s, F2) == a_host.squared()
    assert fp2.eval(i, F2) == b_host.inverse()
    assert pb.is_satisfied()


def test_fp12_mul_sqr_inv_frobenius(setup, rng):
    pb, fp2, fp6, fp12, c = setup
    F12 = c.Fq12
    a_host = _rand12(F12, rng)
    b_host = _rand12(F12, rng)
    a = fp12.const(a_host)
    # allocate b as variables
    bvars = [[fp2.alloc_input(None) for _ in range(3)] for _ in range(2)]
    b = tuple(tuple(bv[0] for bv in half) for half in bvars)
    F2 = c.Fq2
    for h, half in enumerate((b_host.c0, b_host.c1)):
        for j, coord in enumerate((half.c0, half.c1, half.c2)):
            pb.setval(bvars[h][j][1][0], int(coord.c0))
            pb.setval(bvars[h][j][1][1], int(coord.c1))
    m = fp12.mul(a, b)
    s = fp12.sqr(b)
    i = fp12.inv(b)
    f1 = fp12.frobenius(b, 1)
    f6_ = fp12.frobenius(b, 6)
    fp2.generate_witness()
    assert fp12.eval(m) == a_host * b_host
    assert fp12.eval(s) == b_host.squared()
    assert fp12.eval(i) == b_host.inverse()
    assert fp12.eval(f1) == b_host.frobenius(1)
    assert fp12.eval(f6_) == b_host.frobenius(6)
    assert pb.is_satisfied()


def test_fp12_exp(setup, rng):
    pb, fp2, fp6, fp12, c = setup
    F12 = c.Fq12
    a_host = _rand12(F12, rng)
    a = fp12.const(a_host)
    e = 0b110101
    out = fp12.cyclotomic_exp(a, e)
    fp2.generate_witness()
    assert fp12.eval(out) == a_host ** e
    assert pb.is_satisfied()


# -------------------------------------------------- MNT-shape towers
# Fp3 / Fp6(2-over-3) tested over the BW6-761 host tower (the same
# tower shape as MNT6: Fq3 = Fq[v]/(v^3-xi), Fq6 = Fq3[w]/(w^2-v));
# Fp4 over alt_bn128's Fq2 with xi = 9+u (MNT4's Fq4 shape).
# Reference: gadgetlib1/gadgets/fields/{fp3,fp4,fp6}_gadgets.hpp.

@pytest.fixture(scope="module")
def bw6():
    from libsnark_tpu import get_curve
    return get_curve("bw6_761")


def test_fp3_ops(bw6, rng):
    from libsnark_tpu.gadgets.fields_gadgets import Fp3Gadgets
    F3 = bw6.Fq3
    nr = int(F3.NON_RESIDUE)
    pb = Protoboard(bw6.q)
    fp3 = Fp3Gadgets(pb, nr)
    a_host = F3(*[rng.randrange(bw6.q) for _ in range(3)])
    b_host = F3(*[rng.randrange(bw6.q) for _ in range(3)])
    a, _ = fp3.alloc_input(a_host)
    b, _ = fp3.alloc_input(b_host)
    m = fp3.mul(a, b)
    s = fp3.sqr(a)
    i = fp3.inv(b)
    vshift = fp3.mul_by_v(a)
    fp3.generate_witness()
    assert fp3.eval(m, F3) == a_host * b_host
    assert fp3.eval(s, F3) == a_host.squared()
    assert fp3.eval(i, F3) == b_host.inverse()
    v_elt = F3(0, 1, 0)
    assert fp3.eval(vshift, F3) == a_host * v_elt
    assert pb.is_satisfied()


def test_fp6_2over3_ops(bw6, rng):
    from libsnark_tpu.gadgets.fields_gadgets import (
        Fp3Gadgets, Fp6_2over3Gadgets)
    F3, F6 = bw6.Fq3, bw6.Fq6
    pb = Protoboard(bw6.q)
    fp3 = Fp3Gadgets(pb, int(F3.NON_RESIDUE))
    fp6 = Fp6_2over3Gadgets(fp3, F6)
    a_host = F6(F3(*[rng.randrange(bw6.q) for _ in range(3)]),
                F3(*[rng.randrange(bw6.q) for _ in range(3)]))
    b_host = F6(F3(*[rng.randrange(bw6.q) for _ in range(3)]),
                F3(*[rng.randrange(bw6.q) for _ in range(3)]))
    a, _ = fp6.alloc_input(a_host)
    b, _ = fp6.alloc_input(b_host)
    m = fp6.mul(a, b)
    s = fp6.sqr(a)
    i = fp6.inv(b)
    cj = fp6.conjugate(a)
    fp3.generate_witness()
    assert fp6.eval(m, F6) == a_host * b_host
    assert fp6.eval(s, F6) == a_host.squared()
    assert fp6.eval(i, F6) == b_host.inverse()
    assert fp6.eval(cj, F6) == F6(a_host.c0, -a_host.c1)
    assert pb.is_satisfied()


def test_fp4_ops(bn254, rng):
    from libsnark_tpu.fields import make_quadratic_ext
    from libsnark_tpu.gadgets.fields_gadgets import Fp2Gadgets, Fp4Gadgets
    F2 = bn254.Fq2
    F4 = make_quadratic_ext(F2, bn254.xi, "test.Fq4")
    pb = Protoboard(bn254.q)
    fp2 = Fp2Gadgets(pb, int(F2.NON_RESIDUE))
    fp4 = Fp4Gadgets(fp2, bn254.xi, F4)
    a_host = F4(_rand2(F2, rng), _rand2(F2, rng))
    b_host = F4(_rand2(F2, rng), _rand2(F2, rng))
    a, _ = fp4.alloc_input(a_host)
    b, _ = fp4.alloc_input(b_host)
    m = fp4.mul(a, b)
    s = fp4.sqr(a)
    i = fp4.inv(b)
    fp2.generate_witness()
    assert fp4.eval(m, F4) == a_host * b_host
    assert fp4.eval(s, F4) == a_host.squared()
    assert fp4.eval(i, F4) == b_host.inverse()
    assert pb.is_satisfied()
