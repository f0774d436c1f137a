"""Window-size sweep of the fused MSM on the real chip (r4): the old
c >= 11 v5e fault was in the round-1 rake program; the fused kernel is
a different program entirely -- measure c = 10..13 and find the new
optimum (the heuristic cap lives in ops/msm.py default_window_bits).

usage: sweep_msm_c.py [log2m] [c...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)
os.environ.setdefault("LIBSNARK_TPU_MSM_FUSED", "1")

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
cs = [int(a) for a in sys.argv[2:]] or [10, 11, 12, 13]
m = 1 << logm
group = os.environ.get("SWEEP_GROUP", "g1")      # g1 | g2 (Fp2, r5)
curve = get_curve(os.environ.get("SWEEP_CURVE", "alt_bn128"))
fq = FpKernel(curve.fq_params)
if group == "g2":
    from libsnark_tpu.ops.fp2 import Fp2Kernel
    fk = Fp2Kernel(fq, int(curve.Fq2.NON_RESIDUE))
    ck = CurveKernel(fk, f"{curve.name}.G2")
    lead = (2, fq.N)
else:
    fk = fq
    ck = CurveKernel(fq, "G1")
    lead = (fq.N,)
mk = MSMKernel(ck, curve.r.bit_length())
print(f"# backend={jax.default_backend()} m=2^{logm} group={group} "
      f"curve={curve.name} fused="
      f"{os.environ.get('LIBSNARK_TPU_MSM_FUSED')}", flush=True)

rng = np.random.default_rng(0)
nl = -(-curve.r.bit_length() // LIMB_BITS)
x = jnp.asarray(rng.integers(0, 1 << 16, size=lead + (m,),
                             dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=lead + (m,),
                             dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)


def fresh():
    s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
    s[-1] &= 0x2FFF
    return jax.device_put(jnp.asarray(s))


def cksum(tree):
    return sum(jnp.sum(v.astype(jnp.uint32), dtype=jnp.uint32)
               for v in jax.tree_util.tree_leaves(tree))


for c in cs:
    try:
        fn = jax.jit(lambda s, c=c: cksum(mk.msm((x, y, inf), s, c)))
        np.asarray(fn(fresh()))
        best = 1e9
        for _ in range(3):
            s = fresh()
            np.asarray(s)
            t0 = time.perf_counter()
            np.asarray(fn(s))
            best = min(best, time.perf_counter() - t0)
        print(f"c={c:2d}  {best*1e3:8.2f} ms  {m/best:12.0f} pts/s",
              flush=True)
    except Exception as e:
        print(f"c={c:2d}  FAIL: {str(e).splitlines()[0][:110]}",
              flush=True)
