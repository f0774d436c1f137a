"""Fused Pippenger bucket-accumulation Pallas kernel.

The MSM hot loop: after sorting point indices by bucket (digit), every
bucket owns a CONTIGUOUS run of rows in a sorted row-major point array.
This kernel processes a tile of buckets per grid step:

  1. scalar-prefetched per-bucket row offsets/counts drive a dynamic-
     offset DMA of each bucket's (R, 2N) row slab from HBM to VMEM,
  2. rows are transposed to the (N, lanes) compute layout,
  3. a masked in-register tree reduction (madd level 0, full adds after)
     collapses each bucket's R points to ONE Jacobian point,
  4. the (3 coords x N limbs) results are written to the output tile.

One kernel launch replaces the XLA-level gather + log2(R) separate
kernel rounds (and their per-shape Mosaic compiles).

Row layout: points_rows is (rows, 2N) uint32 -- [x limbs | y limbs] per
row; infinity rows are all-zero (x=y=0 is never a valid affine point for
the a=0 curves used here, so the kernel detects infinity as y == 0).
The caller bakes scalar-digit SIGNS into the row data by gathering from
a [P | -P] doubled table.

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

# buckets per grid step; lanes per tree level = B_TILE * width
B_TILE = 8
B_SHIFT = 3                     # log2(B_TILE)


def _ec_madd_nomask(F, X1, Y1, Z1, X2, Y2, q_inf):
    """madd-2007-bl with exceptional-case selects (no validity mask --
    invalid lanes enter as infinity)."""
    from .pallas_ec import _ec_madd
    valid = jnp.ones_like(q_inf)
    return _ec_madd(F, X1, Y1, Z1, X2, Y2, q_inf, valid)


def _ec_add(F, P, Q):
    from .pallas_ec import _ec_add as _add
    return _add(F, P[0], P[1], P[2], Q[0], Q[1], Q[2])


@functools.lru_cache(maxsize=None)
def _build_bucket_reduce(p: int, N: int, n0inv: int, one_mont: tuple,
                         num_buckets: int, R: int, interpret: bool = False):
    """pallas_call: (starts, counts, rows) -> (X, Y, Z) bucket sums.

    starts: (num_buckets,) int32 row offsets into `rows`
    counts: (num_buckets,) int32 bucket occupancies (<= R enforced by
            the caller's chunk loop)
    rows:   (total_rows, 2N) uint32 sorted point rows (HBM-resident)
    out:    three (N, num_buckets) uint32 Jacobian coordinate arrays
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_np = np.asarray(int_to_limbs(p, N)).reshape(N, 1)
    one_np = np.array(one_mont, dtype=np.uint32).reshape(N, 1)
    grid = (num_buckets // B_TILE,)

    def kernel(starts_ref, counts_ref, p_ref, one_ref, rows_hbm,
               ox, oy, oz, slab, sem):
        t = pl.program_id(0)

        # 1. DMA each bucket's contiguous slab: (B_TILE, R, 2N)
        dmas = []
        for j in range(B_TILE):
            start = starts_ref[t * B_TILE + j]
            cp = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(start, R), :], slab.at[j], sem.at[j])
            cp.start()
            dmas.append(cp)
        for cp in dmas:
            cp.wait()

        F = _F(p_ref[...], n0inv, one_ref[...])

        # 2. to compute layout: (B_TILE, R, 2N) -> (2N, R*B_TILE),
        # lane index = r*B_TILE + j (r-major INTERLEAVE). With rows
        # interleaved, "the first h rows of every bucket" is the
        # CONTIGUOUS lane prefix [0, h*B_TILE) -- the halving tree below
        # needs only plain lane slices (Mosaic rejects the slice+merge
        # shape casts the bucket-major layout would need).
        data = jnp.transpose(slab[...], (2, 1, 0))   # (2N, R, B_TILE)
        qx = data[:N].reshape(N, R * B_TILE)
        qy = data[N:].reshape(N, R * B_TILE)

        # mask lanes beyond each bucket's count -> infinity. Computed
        # directly in the flat interleaved shape (iota + per-bucket
        # scalar selects; an (8, R) mask reshaped flat is a vector
        # shape cast Mosaic cannot lower).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R * B_TILE), 1)
        r_idx = jax.lax.shift_right_logical(lane, B_SHIFT)
        cnt = jnp.zeros_like(lane)
        for j in range(B_TILE):
            cnt = jnp.where((lane & (B_TILE - 1)) == j,
                            counts_ref[t * B_TILE + j], cnt)
        q_inf = jnp.logical_or(r_idx >= cnt, _fzero_mask(qy))

        # 3. level 0: lift left half, madd right half (contiguous lane
        # slices in the interleaved layout)
        half = R // 2
        lw = half * B_TILE
        lx, ly, li = qx[:, :lw], qy[:, :lw], q_inf[:, :lw]
        rx, ry, ri = qx[:, lw:], qy[:, lw:], q_inf[:, lw:]
        one = F.one(lx)
        lz = jnp.where(li, jnp.zeros_like(one), one)
        X, Y, Z = _ec_madd_nomask(F, lx, ly, lz, rx, ry, ri)

        # 4. in-register tree over the remaining width (R is a power of
        # two, so widths stay even)
        width = half
        while width > 1:
            h = width // 2
            hw = h * B_TILE
            P = (X[:, :hw], Y[:, :hw], Z[:, :hw])
            Q = (X[:, hw:2 * hw], Y[:, hw:2 * hw], Z[:, hw:2 * hw])
            X, Y, Z = _ec_add(F, P, Q)
            width = h
        X, Y, Z = X[:, :B_TILE], Y[:, :B_TILE], Z[:, :B_TILE]

        ox[...], oy[...], oz[...] = (a[None] for a in (X, Y, Z))

    # Mosaic tiling rule: a block's last dim must be 128-divisible OR
    # equal the array dim. B_TILE=8 lanes per step can't satisfy the
    # former, so outputs are 3-D (T, N, B_TILE) with the block equal to
    # the trailing dims; the caller flattens back to (N, num_buckets).
    T = num_buckets // B_TILE
    out_shape = tuple(jax.ShapeDtypeStruct((T, N, B_TILE), jnp.uint32)
                      for _ in range(3))
    # NB: with PrefetchScalarGridSpec, index maps receive the scalar-
    # prefetch refs after the grid indices
    ospec = pl.BlockSpec((1, N, B_TILE), lambda t, *_: (t, 0, 0))

    cspec = pl.BlockSpec((N, 1), lambda t, *_: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[cspec, cspec, pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(ospec, ospec, ospec),
        scratch_shapes=[
            pltpu.VMEM((B_TILE, R, 2 * N), jnp.uint32),
            pltpu.SemaphoreType.DMA((B_TILE,)),
        ],
    )

    @jax.jit
    def call(starts, counts, rows):
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts, counts, p_np, one_np, rows)
        return tuple(jnp.transpose(o, (1, 0, 2)).reshape(N, num_buckets)
                     for o in outs)

    return call


@functools.lru_cache(maxsize=None)
def _build_horner(p: int, N: int, n0inv: int, one_mont: tuple,
                  W: int, c: int, interpret: bool = False):
    """Single-launch window combine: out = sum_w 2^(c w) S_w.

    Input: (N, W) Jacobian coordinate arrays, window 0 = LSB. The loop
    runs MSB-first: acc = 2^c acc + S_w. Single-lane group ops -- tiny
    data, the launch count (27 x 11 kernels in the XLA formulation) is
    what this kills."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_np = np.asarray(int_to_limbs(p, N)).reshape(N, 1)
    one_np = np.array(one_mont, dtype=np.uint32).reshape(N, 1)
    LW = 128                               # full-lane tiles; lane 0 is
    assert W <= LW                         # the real Horner chain

    def kernel(p_ref, one_ref, sx, sy, sz, ox, oy, oz):
        F = _F(p_ref[...], n0inv, one_ref[...])
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

    shp = jax.ShapeDtypeStruct((N, LW), jnp.uint32)
    fs = pl.BlockSpec((N, LW), lambda: (0, 0))
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
    """S: (X, Y, Z) arrays of shape (N, W), window 0 = LSB. Returns the
    combined point as (N, 1) coordinate arrays."""
    W = S[0].shape[-1]
    fn = _build_horner(fk.p, fk.N, fk.n0inv,
                       tuple(int(v) for v in fk.one_mont_np),
                       W, c, interpret)
    return fn(*S)


def bucket_reduce(fk, starts, counts, rows, R: int, interpret=False):
    """Reduce sorted point rows into per-bucket Jacobian sums.

    fk: FpKernel; starts/counts: (num_buckets,) int32; rows:
    (total_rows, 2N) uint32 with total_rows >= max(starts)+R.
    Returns (X, Y, Z) arrays of shape (N, num_buckets).
    """
    nb = starts.shape[0]
    assert nb % B_TILE == 0, f"num_buckets {nb} % {B_TILE} != 0"
    assert R & (R - 1) == 0, "R must be a power of two"
    fn = _build_bucket_reduce(
        fk.p, fk.N, fk.n0inv, tuple(int(v) for v in fk.one_mont_np),
        nb, R, interpret)
    return fn(starts, counts, rows)
