"""Microbenchmark: XLA gather layouts on TPU for the MSM dense path.

Compares gathering 2.5M points' limbs (a) along the minor/lane axis from
(N, m), (b) as row gathers from (m, N) row-major, (c) row gather + device
transpose back to (N, L).
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

N = 16
m = 1 << 16
L = 27 * 513 * 176        # dense gather size for c=10
rng = np.random.default_rng(0)

x_col = jnp.asarray(rng.integers(0, 1 << 16, size=(N, m), dtype=np.uint32))
x_row = jnp.asarray(np.asarray(x_col).T.copy())
idx = jnp.asarray(rng.integers(0, m, size=(L,), dtype=np.int32))

print(f"# L={L} ({L/1e6:.2f}M point gathers) device="
      f"{jax.devices()[0].platform}", flush=True)


def drain(x):
    return [np.asarray(v) for v in jax.tree_util.tree_leaves(x)]


def bench(name, fn, *args, iters=3):
    t0 = time.monotonic()
    drain(fn(*args))
    tc = time.monotonic() - t0
    times = []
    for _ in range(iters):
        t0 = time.monotonic()
        drain(fn(*args))
        times.append(time.monotonic() - t0)
    print(f"{name:44s} best={min(times)*1e3:9.1f}ms (compile {tc:5.1f}s)",
          flush=True)


# (a) minor-axis gather from (N, m)
bench("lane-axis x[:, idx]  (N,m)->(N,L)",
      jax.jit(lambda x, i: x[:, i]), x_col, idx)

# (b) row gather from (m, N)
bench("row take(x,idx,0)    (m,N)->(L,N)",
      jax.jit(lambda x, i: jnp.take(x, i, axis=0)), x_row, idx)

# (c) row gather + transpose back
bench("row gather + T       (m,N)->(N,L)",
      jax.jit(lambda x, i: jnp.take(x, i, axis=0).T), x_row, idx)

# (d) small gather: (W,B+1) from (W,m) along lanes (the index build)
W, B1 = 27, 513
pos = jnp.asarray(rng.integers(0, m, size=(W, B1), dtype=np.int32))
ordr = jnp.asarray(rng.integers(0, m, size=(W, m), dtype=np.int32))
bench("take_along_axis      (W,m)->(W,B+1)",
      jax.jit(lambda o, p: jnp.take_along_axis(o, p, axis=-1)), ordr, pos)

# (e) the same as (d) but L-sized: (W,m)->(W,(B+1)*R)
posL = jnp.asarray(rng.integers(0, m, size=(W, 513 * 176), dtype=np.int32))
bench("take_along_axis      (W,m)->(W,(B+1)R)",
      jax.jit(lambda o, p: jnp.take_along_axis(o, p, axis=-1)), ordr, posL)

# (f) one-u32-packed sort vs argsort
keys = jnp.asarray(rng.integers(0, 512, size=(W, m), dtype=np.uint32))
bench("argsort (W,m) i32",
      jax.jit(lambda k: jnp.argsort(k.astype(jnp.int32), axis=-1)), keys)
packed = (keys << 17) | jax.lax.broadcasted_iota(jnp.uint32, (W, m), 1)
bench("sort packed u32 (W,m)",
      jax.jit(lambda k: jnp.sort(k, axis=-1)), packed)
