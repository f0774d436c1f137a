"""Fused bucket-reduce kernel correctness (interpret mode on CPU).

Small scalar width keeps the window/bucket grid tiny; the kernel path
(sort -> row gather -> per-bucket DMA -> in-register tree) must match
the host MSM oracle including signed digits, infinity inputs, and
bucket-overflow chunking.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel
from libsnark_tpu.ops.limbs import ints_to_limbs


def _msm_oracle(curve, pts, scalars):
    acc = curve.G1.zero()
    for P, s in zip(pts, scalars):
        acc = acc + P * s
    return acc


@pytest.mark.slow
@pytest.mark.parametrize("m,sbits,c", [(32, 16, 4), (33, 16, 5)])
def test_fused_bucket_msm_matches_oracle(bn254, m, sbits, c):
    curve = bn254
    fq = FpKernel(curve.fq_params)
    ck = CurveKernel(fq, "G1")
    mk = MSMKernel(ck, sbits)
    rng = np.random.default_rng(42 + m)
    G = curve.G1.one()
    pts = [G * int(rng.integers(1, 1 << 62)) for _ in range(m - 1)]
    pts.append(curve.G1.zero())              # infinity input lane
    scalars = [int(rng.integers(0, 1 << sbits)) for _ in range(m)]
    scalars[3] = 0                           # zero scalar lane

    paff = ck.encode_points(pts, jacobian=False)
    sc = jnp.asarray(ints_to_limbs(scalars, -(-sbits // 16)))

    S = mk.window_sums_fused(paff, sc, c, interpret=True)
    out = mk.combine_windows(S, c)
    got = ck.decode_points(out, curve.G1)[0]
    assert got == _msm_oracle(curve, pts, scalars)


@pytest.mark.slow
def test_fused_bucket_msm_g2_matches_oracle(bn254):
    """Fp2 (G2) fused path (r5): the same kernel with the _F2 bundle --
    rows [x0 x1 | y0 y1] -- must match the host G2 MSM oracle including
    signed digits and infinity lanes. Reference role: the kc B-query
    G2 MSM (r1cs_gg_ppzksnark.tcc:544-556)."""
    from libsnark_tpu.ops.fp2 import Fp2Kernel
    curve = bn254
    fq = FpKernel(curve.fq_params)
    fq2 = Fp2Kernel(fq, int(curve.Fq2.NON_RESIDUE))
    ck = CurveKernel(fq2, f"{curve.name}.G2")
    m, sbits, c = 24, 12, 4
    mk = MSMKernel(ck, sbits)
    rng = np.random.default_rng(11)
    G = curve.G2.one()
    pts = [G * int(rng.integers(1, 1 << 62)) for _ in range(m - 1)]
    pts.append(curve.G2.zero())              # infinity input lane
    scalars = [int(rng.integers(0, 1 << sbits)) for _ in range(m)]
    scalars[1] = 0                           # zero scalar lane

    paff = ck.encode_points(pts, jacobian=False)
    sc = jnp.asarray(ints_to_limbs(scalars, -(-sbits // 16)))

    S = mk.window_sums_fused(paff, sc, c, interpret=True)
    out = mk.combine_windows(S, c)
    got = ck.decode_points(out, curve.G2)[0]
    acc = curve.G2.zero()
    for P, s in zip(pts, scalars):
        acc = acc + P * s
    assert got == acc


@pytest.mark.slow
def test_fused_bucket_overflow_chunking(bn254):
    """All-equal scalars concentrate one bucket per window; the chunk
    loop must still produce the right answer."""
    curve = bn254
    fq = FpKernel(curve.fq_params)
    ck = CurveKernel(fq, "G1")
    mk = MSMKernel(ck, 8)
    rng = np.random.default_rng(7)
    m = 24
    G = curve.G1.one()
    pts = [G * int(rng.integers(1, 1 << 62)) for _ in range(m)]
    scalars = [77] * m                       # one hot bucket, count 24
    paff = ck.encode_points(pts, jacobian=False)
    sc = jnp.asarray(ints_to_limbs(scalars, 1))
    S = mk.window_sums_fused(paff, sc, 4, rounds_pad=8, interpret=True)
    out = mk.combine_windows(S, 4)
    got = ck.decode_points(out, curve.G1)[0]
    assert got == _msm_oracle(curve, pts, scalars)


@pytest.mark.slow
def test_horner_kernel_matches_scan(bn254):
    """Fused single-launch Horner == XLA scan combine (interpret)."""
    from libsnark_tpu.ops.pallas_bucket import horner_combine
    curve = bn254
    fq = FpKernel(curve.fq_params)
    ck = CurveKernel(fq, "G1")
    mk = MSMKernel(ck, 16)
    rng = np.random.default_rng(3)
    W, c = 5, 4
    G = curve.G1.one()
    pts = [G * int(rng.integers(1, 1 << 60)) for _ in range(W)]
    pts[2] = curve.G1.zero()                 # infinity window
    P = ck.encode_points(pts)                # Jacobian (N, W)
    S = tuple(a[..., None] for a in P)       # (N, W, 1)
    S = tuple(jnp.moveaxis(a, -2, 0) for a in S)  # (W, N, 1)
    ref = mk.combine_windows(S, c)           # scan path (CPU)
    ref_pt = ck.decode_points(ref, curve.G1)[0]
    flat = tuple(jnp.moveaxis(a, 0, -2)[..., 0] for a in S)
    out = horner_combine(fq, flat, c, interpret=True)
    got = ck.decode_points(out, curve.G1)[0]
    assert got == ref_pt
