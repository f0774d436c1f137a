"""Phase-level profile of the dense-bucket MSM on the real chip.

Axon-tunnel timing discipline (bench.py:117-122):
  * block_until_ready returns BEFORE remote execution completes -- only
    a device->host transfer drains the stream => np.asarray the output;
  * repeat executions on identical resident buffers are served from a
    result cache in ~us => FRESH input buffers every rep;
  * the device->host path drains at ~8-40 MB/s => every timed program
    must return a tiny checksum, never a phase's real (W, m) output.

Phases are measured as CUMULATIVE pipelines (digits; digits+sort;
full window_sums_dense; full msm) so per-phase cost = difference of
adjacent rows; a noop row calibrates dispatch overhead.

usage: profile_msm_phases.py [log2m] [c]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax

_retry = int(os.environ.get("TPU_BENCH_RETRY", "0"))
if (jax.default_backend() == "cpu" and _retry < 10
        and os.environ.get("BENCH_ALLOW_CPU") != "1"):
    print(f"# tpu init failed (attempt {_retry}); retrying",
          file=sys.stderr)
    os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
    time.sleep(8)
    os.execv(sys.executable, [sys.executable] + sys.argv)

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
# random affine-ish points: random x/y limbs are fine for PERF phase
# timing (group math doesn't branch on values)
x = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m), dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)
B = 1 << (c - 1)


def fresh_scalars():
    s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
    s[-1] &= 0x2FFF
    return jax.device_put(jnp.asarray(s))


def cksum(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(v.astype(jnp.uint32) if v.dtype != jnp.uint32 else v,
                       dtype=jnp.uint32) for v in leaves)


def timeit(name, fn, reps=3):
    np.asarray(fn(fresh_scalars()))           # compile + warm
    best = 1e9
    for _ in range(reps):
        s = fresh_scalars()
        np.asarray(s)                          # land input before timing
        t0 = time.perf_counter()
        np.asarray(fn(s))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms", flush=True)
    return best


timeit("noop (checksum only)", jax.jit(lambda s: cksum(s)))
timeit("digits", jax.jit(lambda s: cksum(mk.signed_digits(s, c))))


def digits_sort(s):
    digits, signs = mk.signed_digits(s, c)
    return cksum(mk._sort_and_bounds(digits, m, B, c)) + cksum(signs)


timeit("digits+sort", jax.jit(digits_sort))

# ---- kernel micro-rows at the dense tree's exact shapes. Operands are
# derived IN-GRAPH from the fresh (small) scalar buffer: uploading real
# (W, B, R)-scale arrays through the tunnel would take minutes/rep.
import math as _math
W = -(-curve.r.bit_length() // c) + 1
mean = m / B
R = int(mean + 1.35 * _math.sqrt(2.0 * mean * _math.log(W * B)) + 8)
R += R % 2
print(f"# tree shapes: W={W} B={B} R={R}", flush=True)


def synth(s, shape):
    """Pseudo-random (N, *shape) uint16-limb operand seeded by s."""
    n = int(np.prod(shape))
    i = jnp.arange(fq.N * n, dtype=jnp.uint32).reshape((fq.N,) + shape)
    seed = jnp.sum(s, dtype=jnp.uint32)
    v = (i * jnp.uint32(2654435761) + seed * jnp.uint32(40503)) >> 16
    return v & 0xFFFF


def row_aadd(s):
    sh = (W, B + 1, R // 2)
    ax, ay = synth(s, sh), synth(s + 1, sh)
    bx, by = synth(s + 2, sh), synth(s + 3, sh)
    fi = jnp.zeros(sh, bool)
    return cksum(ck.aadd((ax, ay, fi), (bx, by, fi)))


def row_add_l1(s):
    sh = (W, B + 1, R // 4)
    P = (synth(s, sh), synth(s + 1, sh), synth(s + 2, sh))
    Q = (synth(s + 3, sh), synth(s + 4, sh), synth(s + 5, sh))
    return cksum(ck.add(P, Q))


def row_scan_agg(s):
    sh = (W, B + 1)
    Pb = (synth(s, sh), synth(s + 1, sh), synth(s + 2, sh))
    T = mk._suffix_scan_add(Pb, B + 1)
    S = mk._tree_reduce_points(tuple(a[..., 1:] for a in T))
    return cksum(S)


def row_gather_front(s):
    """window_sums_dense front-end (digits/sort/flat gathers) with the
    EC math replaced by a checksum."""
    digits, signs = mk.signed_digits(s, c)
    order, starts, counts = mk._sort_and_bounds(digits, m, B, c)
    y2 = jnp.concatenate([y, fq.neg(y)], axis=-1)
    signs_flat = signs.reshape(-1)
    order_flat = order.reshape(-1)
    r_idx = jnp.arange(R, dtype=jnp.int32)
    woff = (jnp.arange(0, W, dtype=jnp.int32) * m)[:, None, None]
    pos = jnp.clip(starts[..., None] + r_idx, 0, m - 1)
    valid = r_idx < counts[..., None]
    flat_sorted = (woff + pos).reshape(-1)
    pg = jnp.take(order_flat, flat_sorted)
    wrep = jnp.broadcast_to(woff, pos.shape).reshape(-1)
    sgn_idx = jnp.take(signs_flat, wrep + pg)
    qx = jnp.take(x, pg, axis=-1)
    qy = jnp.take(y2, pg + sgn_idx.astype(jnp.int32) * m, axis=-1)
    qinf = jnp.take(inf, pg)
    return (cksum(qx) + cksum(qy) + jnp.sum(qinf, dtype=jnp.uint32)
            + jnp.sum(valid, dtype=jnp.uint32))


timeit("aadd @(W,B+1,R/2)", jax.jit(row_aadd))
timeit("add  @(W,B+1,R/4)", jax.jit(row_add_l1))
timeit("scan_agg @(W,B+1)", jax.jit(row_scan_agg))
timeit("gather_front", jax.jit(row_gather_front))
timeit("window_sums_dense", jax.jit(
    lambda s: cksum(mk.window_sums_dense((x, y, inf), s, c))))
timeit("msm end-to-end", jax.jit(lambda s: cksum(mk.msm((x, y, inf), s, c))))
