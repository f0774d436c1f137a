"""MSM and NTT kernels vs host oracles."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.fp2 import Fp2Kernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel, msm_host_scalars
from libsnark_tpu.ops.ntt import Radix2Domain
from libsnark_tpu.ops.limbs import ints_to_limbs
from libsnark_tpu.curves.host_ec import multi_scalar_mul


@pytest.fixture(scope="module")
def bn():
    return get_curve("alt_bn128")


@pytest.fixture(scope="module")
def g1msm(bn):
    ck = CurveKernel(FpKernel(bn.fq_params), "G1")
    return MSMKernel(ck, bn.r.bit_length())


def test_msm_g1_small(bn, g1msm):
    rng = random.Random(30)
    m = 97
    pts = [bn.G1.one() * rng.randrange(1, bn.r) for _ in range(m)]
    pts[5] = bn.G1.zero()                 # infinity base
    scalars = [rng.randrange(bn.r) for _ in range(m)]
    scalars[0] = 0                        # zero scalar
    scalars[1] = 1
    P = g1msm.ck.encode_points(pts, jacobian=False)
    out = msm_host_scalars(g1msm, P, scalars, bn.r, c=5)
    got = g1msm.ck.decode_points(out, bn.G1)[0]
    want = multi_scalar_mul(pts, scalars)
    assert got == want


def test_msm_g1_window_sizes(bn, g1msm):
    rng = random.Random(31)
    m = 33
    pts = [bn.G1.one() * rng.randrange(1, bn.r) for _ in range(m)]
    scalars = [rng.randrange(bn.r) for _ in range(m)]
    P = g1msm.ck.encode_points(pts, jacobian=False)
    want = multi_scalar_mul(pts, scalars)
    for c in (4, 8):
        out = msm_host_scalars(g1msm, P, scalars, bn.r, c=c)
        assert g1msm.ck.decode_points(out, bn.G1)[0] == want, f"c={c}"


def test_msm_g1_dense_path(bn, g1msm, monkeypatch):
    """Dense bucket-matrix path (normally m >= 2048) forced on a small
    instance, with adversarial inputs: DUPLICATE points sharing the same
    scalar digit (same bucket -> the level-0 affine add hits its P == Q
    case and must take the doubling repair), infinity bases, and zero
    scalars."""
    monkeypatch.setenv("LIBSNARK_TPU_MSM_DENSE", "1")
    rng = random.Random(33)
    m = 64
    pts = [bn.G1.one() * rng.randrange(1, bn.r) for _ in range(m)]
    pts[7] = pts[6]                       # duplicate point
    pts[9] = bn.G1.zero()                 # infinity base
    scalars = [rng.randrange(bn.r) for _ in range(m)]
    scalars[7] = scalars[6]               # same digits -> same buckets
    scalars[3] = 0
    # all-equal tail: deep single bucket exercises the chunk while_loop
    for j in range(20, 32):
        pts[j] = pts[20]
        scalars[j] = scalars[20]
    P = g1msm.ck.encode_points(pts, jacobian=False)
    out = msm_host_scalars(g1msm, P, scalars, bn.r, c=5)
    got = g1msm.ck.decode_points(out, bn.G1)[0]
    want = multi_scalar_mul(pts, scalars)
    assert got == want


def test_msm_g2(bn):
    rng = random.Random(32)
    fq = FpKernel(bn.fq_params)
    ck2 = CurveKernel(Fp2Kernel(fq, int(bn.Fq2.NON_RESIDUE)), "G2")
    mk = MSMKernel(ck2, bn.r.bit_length())
    m = 17
    pts = [bn.G2.one() * rng.randrange(1, bn.r) for _ in range(m)]
    scalars = [rng.randrange(bn.r) for _ in range(m)]
    P = ck2.encode_points(pts, jacobian=False)
    out = msm_host_scalars(mk, P, scalars, bn.r, c=5)
    got = ck2.decode_points(out, bn.G2)[0]
    assert got == multi_scalar_mul(pts, scalars)


def test_fixed_base_batch_exp(bn, g1msm):
    rng = random.Random(33)
    m, c = 19, 6
    base = bn.G1.one() * 777
    scalars = [rng.randrange(bn.r) for _ in range(m)]
    scalars[0] = 0
    ck = g1msm.ck
    baff = ck.encode_points([base], jacobian=False)
    W = -(-bn.r.bit_length() // c)
    table = jax.jit(lambda b: g1msm.window_table((b[0], b[1]), c, W))(baff)
    table_aff = jax.jit(ck.to_affine)(table)
    nl = -(-bn.r.bit_length() // 16)
    sc = jnp.asarray(ints_to_limbs(scalars, nl))
    out = jax.jit(lambda t, s: g1msm.batch_exp(t, s, c))(table_aff, sc)
    got = ck.decode_points(out, bn.G1)
    want = [base * s for s in scalars]
    assert got == want


# ---------------------------------------------------------------- NTT tests

def host_ntt(vals, omega, p):
    n = len(vals)
    return [sum(vals[j] * pow(omega, i * j, p) % p for j in range(n)) % p
            for i in range(n)]


def test_ntt_roundtrip_and_parity(bn):
    rng = random.Random(34)
    fk = FpKernel(bn.fr_params)
    dom = Radix2Domain(fk, bn.fr_params, 5)
    m = dom.m
    vals = [rng.randrange(bn.r) for _ in range(m)]
    a = jnp.asarray(fk.encode(vals))
    out = fk.decode(jax.jit(dom.fft)(a))
    want = host_ntt(vals, dom.omega, bn.r)
    assert [int(v) for v in out] == want
    # inverse round-trip
    back = fk.decode(jax.jit(dom.ifft)(jax.jit(dom.fft)(a)))
    assert [int(v) for v in back] == vals


def test_coset_fft_and_divide_by_z(bn):
    rng = random.Random(35)
    fk = FpKernel(bn.fr_params)
    dom = Radix2Domain(fk, bn.fr_params, 4)
    m, p, g = dom.m, bn.r, dom.generator
    coeffs = [rng.randrange(p) for _ in range(m)]
    a = jnp.asarray(fk.encode(coeffs))
    out = fk.decode(jax.jit(dom.coset_fft)(a))
    # evaluate polynomial at g*w^i
    for i in [0, 1, m - 1]:
        x = g * pow(dom.omega, i, p) % p
        want = sum(c * pow(x, j, p) for j, c in enumerate(coeffs)) % p
        assert int(out[i]) == want
    # icoset inverts coset
    back = fk.decode(jax.jit(dom.icoset_fft)(jax.jit(dom.coset_fft)(a)))
    assert [int(v) for v in back] == coeffs
    # divide_by_z: multiplies by (g^m - 1)^-1
    dz = fk.decode(jax.jit(dom.divide_by_z_on_coset)(a))
    zi = pow(pow(g, m, p) - 1, -1, p)
    for i in range(m):
        assert int(dz[i]) == coeffs[i] * zi % p


def test_lagrange_coeffs(bn):
    fk = FpKernel(bn.fr_params)
    dom = Radix2Domain(fk, bn.fr_params, 3)
    p = bn.r
    t = 987654321
    L = dom.lagrange_coeffs_at(t)
    # sum L_i(t) * f(w^i) == f(t) for f(x) = x^2 + 3x + 5
    f = lambda x: (x * x + 3 * x + 5) % p
    evals = [f(x) for x in dom.domain_elements()]
    got = sum(l * e for l, e in zip(L, evals)) % p
    assert got == f(t)
    # t inside the domain
    Lw = dom.lagrange_coeffs_at(dom.domain_elements()[3])
    assert Lw[3] == 1 and sum(Lw) == 1


def test_msm_affine_seg_eager_matches_scan(bn, monkeypatch):
    """Host-driven G2 segmentation (the v5e scan-fault workaround,
    proof_systems/base.py _msm_affine_seg_eager) == the in-jit scan
    path, at a shrunken SEGMENT so both run at test scale."""
    import jax.numpy as jnp
    import numpy as np
    from libsnark_tpu.proof_systems.groth16 import Groth16
    from libsnark_tpu.ops.msm import MSMKernel
    from libsnark_tpu.ops.limbs import ints_to_limbs, LIMB_BITS

    g16 = Groth16(bn)
    mk = g16.msm_g2
    rng = np.random.default_rng(11)
    m = 160
    pts = [bn.G2.one() * int(rng.integers(1, 1 << 62)) for _ in range(m)]
    pts[7] = bn.G2.zero()
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(m)]
    scalars[3] = 0
    paff = g16.g2.encode_points(pts, jacobian=False)
    nl = -(-bn.r.bit_length() // LIMB_BITS)
    sc = jnp.asarray(ints_to_limbs(scalars, nl))

    expect = bn.G2.zero()
    for P, s in zip(pts, scalars):
        expect = expect + P * s

    monkeypatch.setattr(MSMKernel, "SEGMENT", 64)
    aff = g16.msm_affine("g2", paff, sc, 6)
    got = g16.decode_g2(aff)
    assert got == expect
