"""Stage-by-stage timing breakdown of the 2^16 G1 MSM on the real TPU.

Times each pipeline stage as its own jitted program (fresh input buffers
per iteration; device->host drain to defeat the tunnel's async caching --
see bench.py header notes).
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

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel, default_window_bits
from libsnark_tpu.ops.limbs import LIMB_BITS

log2m = int(os.environ.get("BENCH_LOG2_POINTS", "16"))
m = 1 << log2m
curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
ck = CurveKernel(fq, "G1")
mk = MSMKernel(ck, curve.r.bit_length())
c = int(os.environ.get("BENCH_WINDOW_BITS", "0")) or default_window_bits(m)
nl = -(-curve.r.bit_length() // LIMB_BITS)
rng = np.random.default_rng(0)

print(f"# m=2^{log2m} c={c} device={jax.devices()[0].platform}", flush=True)

# -- build points (random-ish x/y limbs are fine for timing everything
#    except correctness; use real points so field values are canonical)
table_c, W8 = 8, -(-curve.r.bit_length() // 8)
base = ck.encode_points([curve.G1.one()], jacobian=False)


@jax.jit
def gen_points(bx, by, sc):
    t = mk.window_table((bx, by), table_c, W8)
    taff = ck.to_affine(t)
    return ck.to_affine(mk.batch_exp(taff, sc, table_c))


gen_sc = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
t0 = time.monotonic()
pts = gen_points(base[0], base[1], jnp.asarray(gen_sc))
jax.block_until_ready(pts)
print(f"# gen_points (incl compile): {time.monotonic()-t0:.2f}s", flush=True)


def fresh_scalars():
    s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
    s[-1] &= 0x2FFF
    return jax.device_put(jnp.asarray(s))


def drain(x):
    return [np.asarray(v) for v in jax.tree_util.tree_leaves(x)]


def bench(name, fn, *arg_fns, iters=3):
    # compile+warm
    args = [f() for f in arg_fns]
    t0 = time.monotonic()
    drain(fn(*args))
    tc = time.monotonic() - t0
    times = []
    argsets = [[f() for f in arg_fns] for _ in range(iters)]
    for a in argsets:
        drain(a)
        t0 = time.monotonic()
        drain(fn(*a))
        times.append(time.monotonic() - t0)
    print(f"{name:40s} best={min(times)*1e3:9.1f}ms  (1st incl compile "
          f"{tc:6.1f}s) times_ms={[round(t*1e3,1) for t in times]}",
          flush=True)
    return min(times)


B = 1 << (c - 1)
W = -(-curve.r.bit_length() // c) + 1

# ---- stage 1: digit extraction + sort + counts/starts
@jax.jit
def stage_digits(scalars):
    digits, signs = mk.signed_digits(scalars, c)
    order = jnp.argsort(digits, axis=-1)
    dig_s = jnp.take_along_axis(digits, order, axis=-1)
    counts = jax.vmap(lambda d: jax.ops.segment_sum(
        jnp.ones((m,), jnp.int32), d, num_segments=B + 1))(dig_s)
    starts = jnp.cumsum(counts, axis=-1) - counts
    return order, counts, starts, signs


bench("digits+sort+counts", stage_digits, fresh_scalars)

# ---- stage 2: ONE rake round (gather + madd) at (W, B+1) lanes
x, y, inf = pts
y_neg = fq.neg(y)
o, cnt, st, sg = jax.jit(stage_digits)(fresh_scalars())
drain((o, cnt, st, sg))


@jax.jit
def one_round(order, starts, counts, signs, r):
    widx = jnp.arange(W)[:, None]
    acc = ck.zero((W, B + 1))
    pos = jnp.clip(starts + r, 0, m - 1)
    valid = r < counts
    pg = jnp.take_along_axis(order, pos, axis=-1)
    qx = x[..., pg]
    sgn = signs[widx, pg]
    qy = fq.select(sgn, y_neg[..., pg], y[..., pg])
    qinf = inf[pg]
    return ck.madd(acc, (qx, qy, qinf), valid=valid)


bench("one rake round (gather+madd)", one_round,
      lambda: o, lambda: st, lambda: cnt, lambda: sg,
      lambda: jnp.int32(int(rng.integers(0, 5))))

# ---- stage 2b: gather only
@jax.jit
def gather_only(order, starts, counts, signs, r):
    widx = jnp.arange(W)[:, None]
    pos = jnp.clip(starts + r, 0, m - 1)
    pg = jnp.take_along_axis(order, pos, axis=-1)
    qx = x[..., pg]
    sgn = signs[widx, pg]
    qy = fq.select(sgn, y_neg[..., pg], y[..., pg])
    qinf = inf[pg]
    return qx, qy, qinf


bench("gather only", gather_only,
      lambda: o, lambda: st, lambda: cnt, lambda: sg,
      lambda: jnp.int32(int(rng.integers(0, 5))))

# ---- stage 2c: madd only at the same lane count (no gather)
qx0, qy0, qi0 = jax.jit(gather_only)(o, st, cnt, sg, jnp.int32(0))
drain((qx0, qy0, qi0))


@jax.jit
def madd_only(qx, qy, qi):
    acc = ck.zero((W, B + 1))
    return ck.madd(acc, (qx, qy, qi))


bench(f"madd only ({W}x{B+1} lanes)", madd_only,
      lambda: qx0, lambda: qy0, lambda: qi0)

# ---- stage 3: full rake loop
@jax.jit
def rake(scalars):
    return mk.window_sums(pts, scalars, c)


bench("window_sums (rake total)", rake, fresh_scalars)

# ---- stage 4: suffix scans + weighted aggregation alone
S0 = jax.jit(rake)(fresh_scalars())
drain(S0)

# time the two suffix scans on a (W, B+1) batch
acc_pts = ck.zero((W, B + 1))


@jax.jit
def suffix2(px, py, pz):
    T = mk._suffix_scan_add((px, py, pz), B + 1)
    R = mk._suffix_scan_add(T, B + 1)
    return R


bench("2x suffix scans (agg)", suffix2,
      lambda: qx0, lambda: qy0, lambda: fq.one((W, B + 1)))

# ---- stage 5: combine windows
@jax.jit
def comb(SX, SY, SZ):
    return mk.combine_windows((SX, SY, SZ), c)


bench("combine_windows (horner)", comb,
      lambda: S0[0], lambda: S0[1], lambda: S0[2])

# ---- whole msm for reference
@jax.jit
def whole(scalars):
    return mk.msm(pts, scalars, c)


bench("FULL msm", whole, fresh_scalars)
