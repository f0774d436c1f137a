"""Probe: front-end index-math fixes for the fused MSM (r5).

probe_gather3 showed ~40 ms of the 2^16 MSM in the INDEX stage:
take_along_axis for digit signs (lane-axis take, 1.77M) + the
element-granularity take(gidx_flat, pos). Variants:

  v0  current pipeline (baseline)
  v1  sign bit packed into the sort key (kills take_along_axis; gidx
      falls straight out of the sorted key)
  v2  v1 + two-row-gather composition: rows into sorted order first,
      then the padded-position row gather (kills the element take)

usage: probe_gather4.py [log2m] [c]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax
import jax.numpy as jnp
import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_tpu"
                               if jax.default_backend() == "tpu"
                               else ".jax_cache_local"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel
from libsnark_tpu.ops.limbs import LIMB_BITS
from libsnark_tpu.ops.pallas_bucket import B_TILE, R_SUB

import math

logm = int(sys.argv[1]) if len(sys.argv) > 1 else 16
c = int(sys.argv[2]) if len(sys.argv) > 2 else 10
m = 1 << logm
curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
ck = CurveKernel(fq, "G1")
mk = MSMKernel(ck, curve.r.bit_length())
print(f"# backend={jax.default_backend()} m=2^{logm} c={c}", flush=True)

rng = np.random.default_rng(0)
nl = -(-curve.r.bit_length() // LIMB_BITS)
x = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m), dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)
B = 1 << (c - 1)
W = -(-curve.r.bit_length() // c) + 1
W_full = curve.r.bit_length() // c
mean = m / B
R = int(mean + 1.35 * math.sqrt(2.0 * mean * math.log(W * B)) + 8)
R = -(-max(min(R, 256), R_SUB) // R_SUB) * R_SUB
nbf = W_full * (B + 1)
nb_pad = -(-nbf // B_TILE) * B_TILE
T = nb_pad // B_TILE


def fresh_scalars():
    s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
    s[-1] &= 0x2FFF
    return jax.device_put(jnp.asarray(s))


def cksum(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(v.astype(jnp.uint32) if v.dtype != jnp.uint32
                       else v, dtype=jnp.uint32) for v in leaves)


def timeit(name, fn, reps=3):
    np.asarray(fn(fresh_scalars()))
    best = 1e9
    for _ in range(reps):
        s = fresh_scalars()
        np.asarray(s)
        t0 = time.perf_counter()
        np.asarray(fn(s))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms", flush=True)
    return best


def rows_table():
    live = jnp.logical_not(inf)[:, None]
    xr = jnp.where(live, x.T, 0)
    return jnp.concatenate([
        jnp.concatenate([xr, jnp.where(live, y.T, 0)], axis=1),
        jnp.concatenate([xr, jnp.where(live, fq.neg(y).T, 0)], axis=1)],
        axis=0)


def sort_signed(digits, signs):
    """Packed sort with the sign bit INSIDE the key: key =
    (|digit| << (idx_bits+1)) | (sign << idx_bits) | idx. The sorted
    key yields the signed row index (idx + sign*m) with zero extra
    gathers."""
    idx_bits = max(1, (m - 1).bit_length())
    assert (c - 1) + 1 + idx_bits + 1 <= 32
    iota = jax.lax.broadcasted_iota(jnp.uint32, digits.shape, 1)
    packed = ((digits.astype(jnp.uint32) << (idx_bits + 1))
              | (signs.astype(jnp.uint32) << idx_bits) | iota)
    skey = jnp.sort(packed, axis=-1)
    gidx = (skey & ((1 << (idx_bits + 1)) - 1)).astype(jnp.int32)
    # gidx = idx + sign*2^idx_bits; convert sign*2^idx_bits -> sign*m
    if m != (1 << idx_bits):
        sign = gidx >> idx_bits
        gidx = (gidx & ((1 << idx_bits) - 1)) + sign * m
    dig_s = (skey >> (idx_bits + 1)).astype(jnp.int32)
    targets = jnp.arange(B + 2, dtype=jnp.int32)
    bounds = jax.vmap(lambda d: jnp.searchsorted(d, targets))(dig_s)
    starts = bounds[:, : B + 1].astype(jnp.int32)
    counts = (bounds[:, 1: B + 2] - bounds[:, : B + 1]).astype(jnp.int32)
    return gidx, starts, counts.at[:, 0].set(0)


def positions(starts, counts):
    woff = (jnp.arange(W, dtype=jnp.int32) * m)[:, None]
    st = (starts + woff)[:W_full].reshape(-1)
    if nb_pad != nbf:
        st = jnp.pad(st, (0, nb_pad - nbf))
    sf = st.reshape(T, B_TILE)
    R2 = R // R_SUB
    i_idx = jnp.arange(R2, dtype=jnp.int32)
    r_idx = jnp.arange(R_SUB, dtype=jnp.int32)
    off = i_idx[:, None, None] * R_SUB + r_idx[None, :, None]
    return sf[:, None, None, :] + off


def v0(s):
    digits, signs = mk.signed_digits(s, c)
    order, starts, counts = mk._sort_and_bounds(digits, m, B, c)
    rows_all = rows_table()
    sgn = jnp.take_along_axis(signs, order, axis=-1)
    gidx_flat = (order + sgn.astype(jnp.int32) * m).reshape(-1)
    pos = positions(starts, counts)
    rg = jnp.take(gidx_flat, jnp.clip(pos, 0, W * m - 1).reshape(-1))
    g = jnp.take(rows_all, rg, axis=0)
    G = jnp.transpose(g.reshape(T, R * B_TILE, 2 * fq.N), (0, 2, 1))
    return cksum(G)


def v1(s):
    digits, signs = mk.signed_digits(s, c)
    gidx, starts, counts = sort_signed(digits, signs)
    rows_all = rows_table()
    gidx_flat = gidx.reshape(-1)
    pos = positions(starts, counts)
    rg = jnp.take(gidx_flat, jnp.clip(pos, 0, W * m - 1).reshape(-1))
    g = jnp.take(rows_all, rg, axis=0)
    G = jnp.transpose(g.reshape(T, R * B_TILE, 2 * fq.N), (0, 2, 1))
    return cksum(G)


def v2(s):
    digits, signs = mk.signed_digits(s, c)
    gidx, starts, counts = sort_signed(digits, signs)
    rows_all = rows_table()
    rows_sorted = jnp.take(rows_all, gidx[:W_full].reshape(-1), axis=0)
    pos = positions(starts, counts)
    g = jnp.take(rows_sorted,
                 jnp.clip(pos, 0, W_full * m - 1).reshape(-1), axis=0)
    G = jnp.transpose(g.reshape(T, R * B_TILE, 2 * fq.N), (0, 2, 1))
    return cksum(G)


def v1_pos(s):
    """v1 but checksum BEFORE the two takes: isolates sort+pos cost."""
    digits, signs = mk.signed_digits(s, c)
    gidx, starts, counts = sort_signed(digits, signs)
    pos = positions(starts, counts)
    return cksum(jnp.clip(pos, 0, W * m - 1)) + cksum(gidx)


timeit("noop", jax.jit(lambda s: cksum(s)))
timeit("v1 sort+pos only", jax.jit(v1_pos))
timeit("v0 current front", jax.jit(v0))
timeit("v1 packed-sign front", jax.jit(v1))
timeit("v2 two-row-gather front", jax.jit(v2))
