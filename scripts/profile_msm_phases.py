"""Phase-level profile of the dense-bucket MSM on the real chip:
digits/sort, gather+tree bucket reduce, suffix-scan aggregation, Horner
combine -- each as its own jitted program, timed warm. Identifies where
the 2^16 wall-clock goes (BENCH_r02: 0.473 s total, 13.9% of target).

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
# timing (group math doesn't branch on values), scalars full-range
x = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m), dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)
sc = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
sc[-1] &= 0x2FFF
sc = jnp.asarray(sc)
B = 1 << (c - 1)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.2f} ms", flush=True)
    return out


digits_fn = jax.jit(lambda s: mk.signed_digits(s, c))
digits, signs = timeit("signed_digits", digits_fn, sc)

sort_fn = jax.jit(lambda d: mk._sort_and_bounds(d, m, B, c))
order, starts, counts = timeit("sort_and_bounds", sort_fn, digits)

full = jax.jit(lambda p, s: mk.window_sums_dense(p, s, c))
S = timeit("window_sums_dense (all)", full, (x, y, inf), sc)

comb = jax.jit(lambda S: mk.combine_windows(S, c))
timeit("combine_windows", comb, S)

msm_full = jax.jit(lambda p, s: mk.msm(p, s, c))
timeit("msm end-to-end", msm_full, (x, y, inf), sc)
tot = timeit("msm end-to-end (repeat)", msm_full, (x, y, inf), sc)
