"""TRUE device throughput of the Pallas kernels.

The axon tunnel drains device->host at ~10-40MB/s, so timing any op by
transferring its full output measures the TUNNEL (round-1 mistake).
Here each op is iterated K times inside one jit (dependency-chained) and
only a tiny checksum leaves the device.
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
from libsnark_tpu.ops import pallas_fp, pallas_ec

curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
ck = CurveKernel(fq, "G1")
rng = np.random.default_rng(7)
K = int(os.environ.get("BENCH_CHAIN_ITERS", "16"))
print(f"# device={jax.devices()[0].platform} chain K={K}", flush=True)


def bench(name, fn, *args, per_iter_work=1, iters=3):
    jfn = jax.jit(fn)
    t0 = time.monotonic()
    np.asarray(jfn(*args))
    tc = time.monotonic() - t0
    times = []
    for _ in range(iters):
        t0 = time.monotonic()
        np.asarray(jfn(*args))
        times.append(time.monotonic() - t0)
    best = min(times)
    per = best / K
    rate = per_iter_work / per
    print(f"{name:36s} loop_best={best*1e3:9.2f}ms per_op={per*1e3:8.3f}ms"
          f" -> {rate/1e6:8.2f}M/s (compile {tc:5.1f}s)", flush=True)
    return per


def rand_fe_arr(L):
    a = rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32)
    a[15] &= 0x3FFF
    return jnp.asarray(a)


for L in (16384, 131072):
    a = rand_fe_arr(L)
    b = rand_fe_arr(L)

    def chain_mul(a, b):
        def body(i, x):
            return fq.mul(x, b)
        out = jax.lax.fori_loop(0, K, body, a)
        return jnp.sum(out, dtype=jnp.uint32)

    bench(f"mont_mul L={L}", chain_mul, a, b, per_iter_work=L)

for L in (14336, 131072):
    X, Y = rand_fe_arr(L), rand_fe_arr(L)
    Z = fq.one((L,))
    QX, QY = rand_fe_arr(L), rand_fe_arr(L)
    qi = jnp.zeros((L,), bool)

    def chain_madd(X, Y, Z, QX, QY, qi):
        def body(i, P):
            return ck.madd(P, (QX, QY, qi))
        P = jax.lax.fori_loop(0, K, body, (X, Y, Z))
        return sum(jnp.sum(c, dtype=jnp.uint32) for c in P)

    bench(f"madd L={L}", chain_madd, X, Y, Z, QX, QY, qi,
          per_iter_work=L)

    def chain_add(X, Y, Z, QX, QY):
        Q = (QX, QY, fq.one((L,)))

        def body(i, P):
            return ck.add(P, Q)
        P = jax.lax.fori_loop(0, K, body, (X, Y, Z))
        return sum(jnp.sum(c, dtype=jnp.uint32) for c in P)

    bench(f"add  L={L}", chain_add, X, Y, Z, QX, QY, per_iter_work=L)

# gather timings (in-graph, checksum out)
m = 1 << 16
xcol = rand_fe_arr(m)
idxL = 27 * 513 * 176
idx = jnp.asarray(rng.integers(0, m, size=(idxL,), dtype=np.int32))
xrow = jnp.asarray(np.asarray(xcol).T.copy())


def g_lane(x, i):
    return jnp.sum(x[:, i], dtype=jnp.uint32)


def g_row(x, i):
    return jnp.sum(jnp.take(x, i, axis=0), dtype=jnp.uint32)


bench(f"gather lane-axis {idxL/1e6:.1f}M", g_lane, xcol, idx,
      per_iter_work=idxL * K)   # single-shot; normalize by K to undo
bench(f"gather row-major {idxL/1e6:.1f}M", g_row, xrow, idx,
      per_iter_work=idxL * K)

# argsort
W = 27
keys = jnp.asarray(rng.integers(0, 512, size=(W, m), dtype=np.int32))
bench("argsort (27,65536)", lambda k: jnp.sum(
    jnp.argsort(k, axis=-1), dtype=jnp.int32), keys, per_iter_work=K)
