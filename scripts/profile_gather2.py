"""Gather strategy shootout at the MSM dense-tree shapes.

profile_msm_phases r4 finding: the (W,B+1,R) front-end gathers cost
~88ms of the 243ms 2^16 MSM -- ~20x off the flat-gather rate PERF.md
budgeted. Candidates:

  A  current: lane-axis takes from (N, m) x / (N, 2m) y2 + inf take
  B  row gather: ONE take from a (2m, 2N) row table, then transpose
  C  row gather from a (2m, 128)-lane-padded row table + slice
  D  row gather, no transpose (checksum only; bounds the gather alone)
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
    print(f"# tpu init failed (attempt {_retry}); retrying", file=sys.stderr)
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

print(f"# backend={jax.default_backend()}", flush=True)

N = 16
logm = int(sys.argv[1]) if len(sys.argv) > 1 else 16
m = 1 << logm
W, B, R = 27, 512, 202
K = W * (B + 1) * R
print(f"# m=2^{logm} K={K} ({K/1e6:.2f}M positions)", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 16, size=(N, m), dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(N, m), dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)


def fresh_idx():
    return jax.device_put(jnp.asarray(
        rng.integers(0, 2 * m, size=(K,), dtype=np.int32)))


def cksum(*vs):
    return sum(jnp.sum(v.astype(jnp.uint32), dtype=jnp.uint32) for v in vs)


def timeit(name, fn, reps=3):
    np.asarray(fn(fresh_idx()))
    best = 1e9
    for _ in range(reps):
        s = fresh_idx()
        np.asarray(s)
        t0 = time.perf_counter()
        np.asarray(fn(s))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:9.2f} ms", flush=True)
    return best


timeit("noop", jax.jit(lambda idx: cksum(idx)))


def strat_a(idx):
    pg = idx % m
    y2 = jnp.concatenate([x, y], axis=-1)       # stand-in for [y|-y]
    qx = jnp.take(x, pg, axis=-1)
    qy = jnp.take(y2, idx, axis=-1)
    qinf = jnp.take(inf, pg)
    return cksum(qx, qy) + jnp.sum(qinf, dtype=jnp.uint32)


timeit("A lane-axis takes (current)", jax.jit(strat_a))

rows = jnp.concatenate(
    [jnp.concatenate([x.T, y.T], axis=1)] * 2, axis=0)   # (2m, 2N)


def strat_b(idx):
    g = jnp.take(rows, idx, axis=0)              # (K, 2N)
    gt = g.T                                     # (2N, K)
    return cksum(gt[:N], gt[N:])


timeit("B row gather (2m,2N) + T", jax.jit(strat_b))

rows_pad = jnp.pad(rows, ((0, 0), (0, 128 - 2 * N)))     # (2m, 128)


def strat_c(idx):
    g = jnp.take(rows_pad, idx, axis=0)[:, :2 * N]
    gt = g.T
    return cksum(gt[:N], gt[N:])


timeit("C row gather (2m,128)pad + T", jax.jit(strat_c))


def strat_d(idx):
    g = jnp.take(rows, idx, axis=0)
    return cksum(g)


timeit("D row gather only (no T)", jax.jit(strat_d))


def strat_e(idx):
    # gather on a (2m, 2N) int8-viewed... skip; instead: gather x only
    g = jnp.take(rows[:, :N], idx, axis=0)
    return cksum(g)


timeit("E half-row gather only", jax.jit(strat_e))
