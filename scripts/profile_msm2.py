"""Transfer-free stage breakdown of the DENSE MSM path on TPU.

Each stage jitted with a scalar checksum output (the tunnel poisons any
timing that moves real data host-side).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax

_retry = int(os.environ.get("TPU_BENCH_RETRY", "0"))
if jax.default_backend() == "cpu" and _retry < 10:
    print(f"# tpu init failed (attempt {_retry}); retrying", file=sys.stderr)
    os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
    time.sleep(8)
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import math
from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel, default_window_bits, _tree_map
from libsnark_tpu.ops.limbs import LIMB_BITS

curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
ck = CurveKernel(fq, "G1")
mk = MSMKernel(ck, curve.r.bit_length())
log2m = int(os.environ.get("BENCH_LOG2_POINTS", "16"))
m = 1 << log2m
c = int(os.environ.get("BENCH_WINDOW_BITS", "0")) or default_window_bits(m)
B = 1 << (c - 1)
nl = -(-curve.r.bit_length() // LIMB_BITS)
rng = np.random.default_rng(0)
print(f"# m=2^{log2m} c={c} device={jax.devices()[0].platform}", flush=True)

# realistic field-element arrays standing in for points (values < p;
# correctness is covered by tests -- this is a timing rig)
x = jnp.asarray(rng.integers(0, 1 << 16, size=(16, m), dtype=np.uint32)
                ).at[15].set(0)
y = jnp.asarray(rng.integers(0, 1 << 16, size=(16, m), dtype=np.uint32)
                ).at[15].set(0)
inf = jnp.zeros((m,), bool)
pts = (x, y, inf)


def fresh_scalars():
    s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
    s[-1] &= 0x2FFF
    return jax.device_put(jnp.asarray(s))


def cs(tree):
    return sum(jnp.sum(a.astype(jnp.uint32), dtype=jnp.uint32)
               for a in jax.tree_util.tree_leaves(tree))


def bench(name, fn, *args, iters=3):
    jfn = jax.jit(fn)
    t0 = time.monotonic()
    np.asarray(jfn(*args))
    tc = time.monotonic() - t0
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        np.asarray(jfn(*args))
        ts.append(time.monotonic() - t0)
    print(f"{name:40s} best={min(ts)*1e3:9.1f}ms (compile {tc:6.1f}s)",
          flush=True)
    return min(ts)


sc0 = fresh_scalars()

# 1. digits + sort + counts
def stage_sort(sc):
    digits, signs = mk.signed_digits(sc, c)
    order = jnp.argsort(digits, axis=-1)
    dig_s = jnp.take_along_axis(digits, order, axis=-1)
    counts = jax.vmap(lambda d: jax.ops.segment_sum(
        jnp.ones((m,), jnp.int32), d, num_segments=B + 1))(dig_s)
    return cs((order, counts, signs))


bench("digits+sort+counts", stage_sort, sc0)

# 2. index build + dense gather (the chunk()'s gather half)
W = -(-curve.r.bit_length() // c) + 1
mean = m / B
R = int(mean + 2.5 * math.sqrt(2.0 * max(mean, 1.0)
                               * math.log(max(W * B, 2))) + 8)
R += R % 2
print(f"# W={W} B={B} R={R} lanes={W*(B+1)*R/1e6:.2f}M", flush=True)


def stage_gather(sc):
    digits, signs = mk.signed_digits(sc, c)
    order = jnp.argsort(digits, axis=-1)
    dig_s = jnp.take_along_axis(digits, order, axis=-1)
    counts = jax.vmap(lambda d: jax.ops.segment_sum(
        jnp.ones((m,), jnp.int32), d, num_segments=B + 1))(dig_s)
    starts = jnp.cumsum(counts, axis=-1) - counts
    counts = counts.at[:, 0].set(0)
    r_idx = jnp.arange(R, dtype=jnp.int32)
    widx = jnp.arange(W)[:, None, None]
    y_neg = fq.neg(y)
    pos = jnp.clip(starts[..., None] + r_idx, 0, m - 1)
    valid = r_idx < counts[..., None]
    pg = jnp.take_along_axis(
        order[:, None, :], pos.reshape(W, 1, -1), axis=-1
    ).reshape(W, B + 1, R)
    qx = x[..., pg]
    sgn = signs[widx, pg]
    qy = fq.select(sgn, y_neg[..., pg], y[..., pg])
    qinf = jnp.logical_or(inf[pg], jnp.logical_not(valid))
    return cs((qx, qy, qinf))


bench("sort+index+dense gather", stage_gather, sc0)

# 3. tree reduce alone at the dense lane count (synthetic inputs built
#    in-graph; zero transfers)
L = W * (B + 1) * (R // 2)


def stage_tree(seedarr):
    base = seedarr  # (16, m)
    reps = -(-L // m)
    qx_ = jnp.tile(base, (1, 2 * reps))[:, :2 * L].reshape(16, W, B + 1, R)
    qy_ = jnp.tile(base, (1, 2 * reps))[:, :2 * L].reshape(16, W, B + 1, R)
    qi_ = jnp.zeros((W, B + 1, R), bool)
    half = R // 2
    lx, ly, li = qx_[..., :half], qy_[..., :half], qi_[..., :half]
    one = fq.one(li.shape)
    accL = (lx, ly, fq.select(li, fq.zeros(li.shape), one))
    acc = ck.madd(accL, (qx_[..., half:], qy_[..., half:], qi_[..., half:]))
    P = mk._tree_reduce_points(acc)
    return cs(P)


bench("dense tree reduce (madd+adds)", stage_tree, x)

# 4. full window_sums_dense
bench("window_sums_dense", lambda sc: cs(mk.window_sums_dense(pts, sc, c)),
      sc0)

# 5. suffix scans at (W, B+1)
def stage_suffix(seedarr):
    reps = -(-(W * (B + 1)) // m)
    base = jnp.tile(seedarr, (1, reps))[:, :W * (B + 1)]
    P = (base.reshape(16, W, B + 1), base.reshape(16, W, B + 1),
         fq.one((W, B + 1)))
    T = mk._suffix_scan_add(P, B + 1)
    R2 = mk._suffix_scan_add(T, B + 1)
    return cs(R2)


bench("2x suffix scans", stage_suffix, x)

# 6. fused horner combine
def stage_horner(seedarr):
    S = (seedarr[:, :W], seedarr[:, :W], fq.one((W,)))
    from libsnark_tpu.ops.pallas_bucket import horner_combine
    return cs(horner_combine(fq, S, c))


bench("fused horner combine", stage_horner, x)

# 7. FULL msm (dense + fused horner)
bench("FULL msm dense", lambda sc: cs(mk.msm(pts, sc, c)), sc0)
