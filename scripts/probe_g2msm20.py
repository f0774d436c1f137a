"""Probe the G2 (Fp2) dense segmented MSM at 2^20 on the real chip --
the one prover program not yet bisected for the groth20 worker crash
(G1 dense/fused MSM, witness map, and all NTT components pass
standalone at 2^20).

usage: probe_g2msm20.py [logm]
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
from libsnark_tpu.proof_systems.base import PairingSystem
from libsnark_tpu.ops.limbs import LIMB_BITS

logm = int(sys.argv[1]) if len(sys.argv) > 1 else 20
m = 1 << logm
curve = get_curve("alt_bn128")


class PS(PairingSystem):
    pass


ps = PS(curve)
mk = ps.msm_g2
fk2 = ps.fq2
print(f"# backend={jax.default_backend()} m=2^{logm} G2 lead dims "
      f"{(2, ps.fq.N)}", flush=True)

rng = np.random.default_rng(0)
nl = -(-curve.r.bit_length() // LIMB_BITS)
x = jnp.asarray(rng.integers(0, 1 << 16, size=(2, ps.fq.N, m),
                             dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(2, ps.fq.N, m),
                             dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)
s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
s[-1] &= 0x2FFF


def cksum(tree):
    return sum(jnp.sum(v.astype(jnp.uint32), dtype=jnp.uint32)
               for v in jax.tree_util.tree_leaves(tree))


t0 = time.time()
out = np.asarray(jax.jit(
    lambda px, py, pinf, sc: cksum(mk.msm((px, py, pinf), sc, 10)))(
        x, y, inf, jnp.asarray(s)))
print(f"OK g2 msm: {out} ({time.time()-t0:.0f}s incl compile)",
      flush=True)
