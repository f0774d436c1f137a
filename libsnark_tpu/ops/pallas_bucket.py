"""Fused Pippenger bucket-accumulation Pallas kernel (v4).

The MSM hot loop: after sorting point indices by bucket (digit), every
bucket owns a contiguous run of rows in the sorted order. The caller
(msm.py window_sums_fused) gathers those rows XLA-side into the exact
interleaved layout this kernel consumes -- (2N, T, R*B_TILE) with lane
index (chunk i, row r, bucket j) = i*R_SUB*B_TILE + r*B_TILE + j per
bucket tile -- and the kernel reduces each bucket's rows to ONE
Jacobian point:

  phase 1  fori_loop over R_SUB-row sub-chunks: ONE (N, 1024)-lane
           masked madd per step; trip count = ceil(max_count/R_SUB)
           for THIS tile, so short/empty tiles cost ~nothing;
  phase 2  fori_loop log2(R_SUB) LANE-ROLL halving tree: ONE full add
           per step collapses the R_SUB partial sums per bucket
           (rolled-in lanes compute garbage; group ops are total and
           only lanes [0, B_TILE) are read out).

Design history (scripts/probe_mosaic_ops.py, probe_mosaic_dma.py):
v1 fully unrolled a log2(R)-level halving tree -> Mosaic compile blew
past 9.5 min; v2's (N, R_SUB, B) -> (N, R_SUB*B) minor-dim merge is an
unsupported shape cast; v3's per-bucket dynamic DMA requires 128-lane
rows (4x bandwidth + VMEM). v4 keeps ALL layout work (gather,
interleave, padding) in XLA where it is cheap and streams regular
BlockSpec blocks -- the kernel body is exactly one madd, one add, and
one doubling-repair cond, so Mosaic compiles in seconds.

P == Q collisions (adversarial scalar distributions) are repaired
in-loop: the madd/add bodies return a need-double flag and a lax.cond
applies the doubling formula only when some lane actually flagged
(never, for random MSM inputs).

Row layout: gathered rows are [x limbs | y limbs] columns of a
(2N, lanes) array; digit SIGNS are baked in by gathering from a
doubled [P | -P] table; infinity and padding lanes are killed by the
per-bucket count mask (and y == 0 marks input points at infinity --
x=y=0 is never a valid affine point on these curves).

Reference role: the bucket loop of multi_exp BDLO12_signed
(kc_multiexp.tcc:63-112) -- redesigned as a single fused TPU kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs
from .pallas_fp import _F, _fselect, _fzero_mask
from .pallas_ec import _ec_add_flag, _ec_madd_flag, _fk_info, _make_F

# buckets per grid step (one full lane dim)
B_TILE = 128
# rows madd-accumulated per phase-1 step
# rows madd-accumulated per phase-1 step. r5 device sweep at 2^16/c=10
# (LIBSNARK_TPU_MSM_RSUB): 8 -> 116.6 ms, 4 -> 99.8, 2 -> 99.2, 16 ->
# 143.8. Phase-2 tree work scales with R_SUB*B_TILE lanes per level *
# log2(R_SUB) levels, phase-1 trip count with 1/R_SUB: 4 balances them.
R_SUB = 4
# phase-1 compute width
_CW = R_SUB * B_TILE


def _ec_add(F, P, Q):
    from .pallas_ec import _ec_add as _add
    return _add(F, P[0], P[1], P[2], Q[0], Q[1], Q[2])


@functools.lru_cache(maxsize=None)
def _build_bucket_reduce(p: int, N: int, n0inv: int, one_mont: tuple,
                         num_buckets: int, R: int, interpret: bool = False,
                         r_sub: int = R_SUB, ext: int = 1,
                         beta_small: int = 0, beta_neg: bool = False,
                         b_tile: int = B_TILE):
    """pallas_call: (G, counts) -> (X, Y, Z) bucket sums.

    G:      (T, 2*FW, R*b_tile) uint32 gathered rows (FW = ext*N field
            rows: x limbs then y limbs; Fp2 rows are [x0 x1 | y0 y1]),
            T = num_buckets / b_tile tiles; lane layout (i, r, j) as in
            the module doc (tile index LEADS: Mosaic requires the last
            two block dims to be (8, 128)-divisible or full)
    counts: (1, T, b_tile) int32 per-bucket occupancies (<= R enforced
            by the caller's chunk loop)
    out:    three (FW, num_buckets) uint32 Jacobian coordinate arrays

    r_sub:  rows madd-accumulated per phase-1 step (phase-2 tree depth
            = log2(r_sub)); R % r_sub == 0.
    ext:    1 = plain Fp (G1), 2 = Fp2 via _F2 (a = 0 G2 twists --
            the B-query MSM of r1cs_gg_ppzksnark.tcc:544-556).
    b_tile: buckets per grid step; 64 for Fp2 keeps the (2*FW,
            R*b_tile) block inside the VMEM budget.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .pallas_ec import _ec_dbl

    p_np = np.asarray(int_to_limbs(p, N)).reshape(N, 1)
    one_np = np.array(one_mont, dtype=np.uint32).reshape(N, 1)
    assert num_buckets % b_tile == 0 and R % r_sub == 0
    assert r_sub & (r_sub - 1) == 0 and r_sub >= 1
    assert b_tile & (b_tile - 1) == 0 and b_tile >= 8
    FW = ext * N
    T = num_buckets // b_tile
    LEVELS = r_sub.bit_length() - 1           # log2(r_sub)
    CW = r_sub * b_tile                       # phase-1 compute width
    BT_SHIFT = b_tile.bit_length() - 1

    def _repair(F, nd, Xp, Yp, Zp, X, Y, Z):
        def fix(_):
            dX, dY, dZ = _ec_dbl(F, Xp, Yp, Zp)
            return (_fselect(nd, dX, X), _fselect(nd, dY, Y),
                    _fselect(nd, dZ, Z))
        return jax.lax.cond(jnp.any(nd), fix, lambda _: (X, Y, Z), None)

    def kernel(p_ref, one_ref, g_ref, cnt_ref, ox, oy, oz):
        F = _make_F(p_ref[...], one_ref[...], n0inv, ext,
                    beta_small, beta_neg)
        cnt = cnt_ref[0]                       # (1, b_tile) int32

        maxc = jnp.max(cnt)
        # per-lane counts / chunk-row index in the (r, j) lane layout
        cnt_l = jnp.concatenate([cnt] * r_sub, axis=-1)    # (1, CW)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)
        r_loc = jax.lax.shift_right_logical(lane, BT_SHIFT)

        zero2 = jnp.zeros((FW, b_tile), jnp.uint32)
        ox[...], oy[...], oz[...] = zero2, zero2, zero2

        @pl.when(maxc > 0)
        def _():
            def p1_body(i, acc):
                Xp, Yp, Zp = acc
                chunk = g_ref[0, :, pl.ds(i * CW, CW)]     # (2FW, CW)
                cx = chunk[:FW]
                cy = chunk[FW:]
                q_inf = jnp.logical_or(i * r_sub + r_loc >= cnt_l,
                                       _fzero_mask(cy))
                valid = jnp.ones_like(q_inf)
                X, Y, Z, nd = _ec_madd_flag(F, Xp, Yp, Zp, cx, cy,
                                            q_inf, valid)
                return _repair(F, nd, Xp, Yp, Zp, X, Y, Z)

            trips = jax.lax.div(maxc + (r_sub - 1), jnp.int32(r_sub))
            # trip 0 peeled: the accumulator starts at infinity, so a
            # madd would just select Q -- lift chunk 0 directly (dead
            # lanes get Z = 0 = infinity) and loop from trip 1.
            chunk0 = g_ref[0, :, pl.ds(0, CW)]
            cx0 = chunk0[:FW]
            cy0 = chunk0[FW:]
            dead0 = jnp.logical_or(r_loc >= cnt_l, _fzero_mask(cy0))
            Z0 = jnp.where(dead0, jnp.zeros((FW, CW), jnp.uint32),
                           F.one(cx0))
            X, Y, Z = jax.lax.fori_loop(
                1, trips, p1_body, (cx0, cy0, Z0))

            def p2_body(k, acc):
                Xp, Yp, Zp = acc
                sh = jax.lax.shift_right_logical(jnp.int32(CW), k + 1)
                Qx = pltpu.roll(Xp, CW - sh, 1)
                Qy = pltpu.roll(Yp, CW - sh, 1)
                Qz = pltpu.roll(Zp, CW - sh, 1)
                X2, Y2, Z2, nd = _ec_add_flag(F, Xp, Yp, Zp, Qx, Qy, Qz)
                return _repair(F, nd, Xp, Yp, Zp, X2, Y2, Z2)

            X, Y, Z = jax.lax.fori_loop(0, LEVELS, p2_body, (X, Y, Z))
            ox[...], oy[...], oz[...] = (a[:, :b_tile] for a in (X, Y, Z))

    out_shape = tuple(
        jax.ShapeDtypeStruct((FW, num_buckets), jnp.uint32)
        for _ in range(3))
    cs = pl.BlockSpec((N, 1), lambda t: (0, 0))
    gs = pl.BlockSpec((1, 2 * FW, R * b_tile), lambda t: (t, 0, 0))
    ns = pl.BlockSpec((1, 1, b_tile), lambda t: (t, 0, 0))
    os_ = pl.BlockSpec((FW, b_tile), lambda t: (0, t))

    @jax.jit
    def call(G, counts):
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(T,),
            in_specs=[cs, cs, gs, ns],
            out_specs=(os_, os_, os_),
            interpret=interpret,
        )(p_np, one_np, G,
          counts.reshape(T, 1, b_tile).astype(jnp.int32))

    return call


def bucket_reduce(fk, G, counts, R: int, interpret=False, r_sub=R_SUB,
                  b_tile=B_TILE):
    """Reduce gathered interleaved point rows into per-bucket Jacobian
    sums.

    fk: FpKernel or Fp2Kernel; G: (T, 2*FW, R*b_tile) uint32 (see
    module doc); counts: (num_buckets,) int32. Returns (X, Y, Z) of
    shape (FW, num_buckets) with num_buckets = T * b_tile.
    """
    nb = counts.shape[0]
    assert nb % b_tile == 0, f"num_buckets {nb} % {b_tile} != 0"
    assert R % r_sub == 0, f"R {R} % {r_sub} != 0"
    p, N, n0inv, onem, ext, bs, bn = _fk_info(fk)
    fn = _build_bucket_reduce(
        p, N, n0inv, onem, nb, R, interpret, r_sub, ext, bs, bn, b_tile)
    return fn(G, counts)


@functools.lru_cache(maxsize=None)
def _build_horner(p: int, N: int, n0inv: int, one_mont: tuple,
                  W: int, c: int, interpret: bool = False,
                  ext: int = 1, beta_small: int = 0,
                  beta_neg: bool = False):
    """Single-launch window combine: out = sum_w 2^(c w) S_w.

    Input: (FW, W) Jacobian coordinate arrays, window 0 = LSB. The loop
    runs MSB-first: acc = 2^c acc + S_w. Single-lane group ops -- tiny
    data, the launch count (27 x 11 kernels in the XLA formulation) is
    what this kills."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_np = np.asarray(int_to_limbs(p, N)).reshape(N, 1)
    one_np = np.array(one_mont, dtype=np.uint32).reshape(N, 1)
    FW = ext * N
    LW = 128                               # full-lane tiles; lane 0 is
    assert W <= LW                         # the real Horner chain

    def kernel(p_ref, one_ref, sx, sy, sz, ox, oy, oz):
        F = _make_F(p_ref[...], one_ref[...], n0inv, ext,
                    beta_small, beta_neg)
        from .pallas_ec import _ec_dbl
        # rotate so lane 0 holds window W-1 (MSB); subsequent +1 rolls
        # walk lane 0 down through W-2 .. 0. Lanes != 0 run harmless
        # garbage chains (all ops are total).
        AX = pltpu.roll(sx[...], LW - (W - 1), 1)
        AY = pltpu.roll(sy[...], LW - (W - 1), 1)
        AZ = pltpu.roll(sz[...], LW - (W - 1), 1)

        def body(i, state):
            X, Y, Z, AX, AY, AZ = state
            for _ in range(c):
                X, Y, Z = _ec_dbl(F, X, Y, Z)
            AX = pltpu.roll(AX, 1, 1)
            AY = pltpu.roll(AY, 1, 1)
            AZ = pltpu.roll(AZ, 1, 1)
            X, Y, Z = _ec_add(F, (X, Y, Z), (AX, AY, AZ))
            return (X, Y, Z, AX, AY, AZ)

        X, Y, Z, *_ = jax.lax.fori_loop(
            0, W - 1, body, (AX, AY, AZ, AX, AY, AZ))
        ox[...], oy[...], oz[...] = X, Y, Z

    shp = jax.ShapeDtypeStruct((FW, LW), jnp.uint32)
    fs = pl.BlockSpec((FW, LW), lambda: (0, 0))
    cs = pl.BlockSpec((N, 1), lambda: (0, 0))

    @jax.jit
    def call(sx, sy, sz):
        pad = ((0, 0), (0, LW - W))
        outs = pl.pallas_call(
            kernel, out_shape=(shp, shp, shp),
            in_specs=[cs, cs, fs, fs, fs],
            out_specs=(fs, fs, fs),
            interpret=interpret,
        )(p_np, one_np, jnp.pad(sx, pad), jnp.pad(sy, pad),
          jnp.pad(sz, pad))
        return tuple(o[:, 0:1] for o in outs)

    return call


def horner_combine(fk, S, c: int, interpret=False):
    """S: (X, Y, Z) arrays of shape (FW, W) (FW = ext*N; Fp2 rows are
    [c0 limbs; c1 limbs]), window 0 = LSB. Returns the combined point
    as (FW, 1) coordinate arrays."""
    W = S[0].shape[-1]
    p, N, n0inv, onem, ext, bs, bn = _fk_info(fk)
    fn = _build_horner(p, N, n0inv, onem, W, c, interpret, ext, bs, bn)
    return fn(*S)
