"""Correctness + throughput microbench of the v2 (2D) Pallas kernels.

Checks mont_mul / madd / add / dbl against host bigint oracles, then
times them at MSM-relevant lane counts.
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
p = curve.q
rng = np.random.default_rng(7)
print(f"# device={jax.devices()[0].platform}", flush=True)


def drain(x):
    return [np.asarray(v) for v in jax.tree_util.tree_leaves(x)]


def rand_fe(n):
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
            % p for _ in range(n)]
    return vals


# ---------------- correctness: mont_mul vs host ----------------
n = 256
av, bv = rand_fe(n), rand_fe(n)
a = jnp.asarray(fq.encode(av))
b = jnp.asarray(fq.encode(bv))
out = pallas_fp.mont_mul(fq, a, b)
got = fq.decode(out)
exp = [x * y % p for x, y in zip(av, bv)]
bad = sum(1 for g, e in zip(got, exp) if int(g) != e)
print(f"mont_mul correctness: {n - bad}/{n} ok", flush=True)
assert bad == 0, "mont_mul mismatch"

# ---------------- correctness: madd/add/dbl vs host EC ----------------
G = curve.G1.one()
pts1 = [G * int(rng.integers(1, 1 << 60)) for _ in range(64)]
pts2 = [G * int(rng.integers(1, 1 << 60)) for _ in range(64)]
# exercise exceptional cases
pts2[0] = pts1[0]                 # P == Q -> double
pts2[1] = -pts1[1]                # P == -Q -> infinity
pts1[2] = curve.G1.zero()         # P = inf
pts2[3] = curve.G1.zero()         # Q = inf

P = ck.encode_points(pts1)        # Jacobian
Qa = ck.encode_points(pts2, jacobian=False)
Qj = ck.encode_points(pts2)

mres = pallas_ec.madd(fq, P, Qa)
ares = pallas_ec.add(fq, P, Qj)
dres = pallas_ec.dbl(fq, P)
m_dec = ck.decode_points(mres, curve.G1)
a_dec = ck.decode_points(ares, curve.G1)
d_dec = ck.decode_points(dres, curve.G1)
exp_sum = [x + y for x, y in zip(pts1, pts2)]
exp_dbl = [x + x for x in pts1]
badm = sum(1 for g, e in zip(m_dec, exp_sum) if g != e)
bada = sum(1 for g, e in zip(a_dec, exp_sum) if g != e)
badd = sum(1 for g, e in zip(d_dec, exp_dbl) if g != e)
print(f"madd {64-badm}/64 ok; add {64-bada}/64 ok; dbl {64-badd}/64 ok",
      flush=True)
assert badm == bada == badd == 0, "EC kernel mismatch"

# ---------------- throughput ----------------
def bench(name, fn, *args, iters=5):
    t0 = time.monotonic()
    drain(fn(*args))
    tc = time.monotonic() - t0
    times = []
    for _ in range(iters):
        t0 = time.monotonic()
        drain(fn(*args))
        times.append(time.monotonic() - t0)
    best = min(times)
    print(f"{name:40s} best={best*1e3:9.2f}ms (compile {tc:5.1f}s)",
          flush=True)
    return best


for L in (16384, 131072, 1 << 20):
    ax = jnp.asarray(rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32))
    ax = ax.at[15].set(0)     # keep < p
    bx = jnp.asarray(rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32))
    bx = bx.at[15].set(0)
    t = bench(f"mont_mul L={L}", lambda a_, b_: pallas_fp.mont_mul(fq, a_, b_),
              ax, bx)
    print(f"  -> {L/t/1e6:.1f} Mmul/s", flush=True)

for L in (14336, 131072):
    X = jnp.asarray(rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32))
    X = X.at[15].set(0)
    Y, Z, X2, Y2 = (X, X, X, X)
    qi = jnp.zeros((L,), bool)
    va = jnp.ones((L,), bool)
    t = bench(f"madd L={L}",
              lambda *a_: pallas_ec.madd(fq, (a_[0], a_[1], a_[2]),
                                         (a_[3], a_[4], a_[5]), a_[6]),
              X, Y, Z, X2, Y2, qi, va)
    print(f"  -> {L/t/1e6:.2f} Madd/s", flush=True)
    t = bench(f"add  L={L}",
              lambda *a_: pallas_ec.add(fq, (a_[0], a_[1], a_[2]),
                                        (a_[3], a_[4], a_[5])),
              X, Y, Z, X2, Y2, Z)
    print(f"  -> {L/t/1e6:.2f} Madd/s", flush=True)
