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
timeit("window_sums_dense", jax.jit(
    lambda s: cksum(mk.window_sums_dense((x, y, inf), s, c))))
timeit("msm end-to-end", jax.jit(lambda s: cksum(mk.msm((x, y, inf), s, c))))
