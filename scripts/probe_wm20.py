"""Bisect the groth20 TPU-worker crash (r4): run the 2^20 witness map
and the 2^20 dense-path MSM standalone. (2^20 fused MSM and all 2^20
NTT components already pass standalone; both fused and dense prover
runs crash at the first output drain, so the fault is in a program both
share -- or in the dense MSM, which the fused run also compiles... this
probe separates them.)

usage: probe_wm20.py [logc] [step: wm|msm|all]
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
from libsnark_tpu.ops.limbs import LIMB_BITS

logc = int(sys.argv[1]) if len(sys.argv) > 1 else 20
which = sys.argv[2] if len(sys.argv) > 2 else "all"
curve = get_curve("alt_bn128")
print(f"# backend={jax.default_backend()} logc={logc} step={which}",
      flush=True)


def cksum(v):
    return jnp.sum(v.astype(jnp.uint32), dtype=jnp.uint32)


if which in ("wm", "all"):
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.relations.r1cs import R1CSDevice
    from libsnark_tpu.reductions.r1cs_to_qap import (qap_domain,
                                                     qap_witness_map)
    t0 = time.time()
    nc = (1 << logc) - 2
    cs, primary, aux = generate_r1cs_example(curve.r, nc, 1)
    print(f"# example built ({time.time()-t0:.0f}s)", flush=True)
    fr = FpKernel(curve.fr_params)
    dev = R1CSDevice.build(cs, fr)
    domain = qap_domain(fr, curve.fr_params, cs)
    print(f"# domain m={domain.m}", flush=True)
    full = [1] + [v % curve.r for v in primary] \
        + [v % curve.r for v in aux]
    am = jnp.asarray(fr.encode(full))

    def wm(a, arrs, dt):
        H = qap_witness_map(dev, domain, a, arrs, dt)
        return cksum(H) + cksum(fr.from_mont(a))

    t0 = time.time()
    out = np.asarray(jax.jit(wm)(am, dev.device_arrays(),
                                 domain.device_tables()))
    print(f"OK wm: {out} ({time.time()-t0:.0f}s incl compile)",
          flush=True)

if which in ("msm", "all"):
    from libsnark_tpu.ops.ec import CurveKernel
    from libsnark_tpu.ops.msm import MSMKernel
    os.environ["LIBSNARK_TPU_MSM_FUSED"] = "0"
    fq = FpKernel(curve.fq_params)
    ck = CurveKernel(fq, "G1")
    mk = MSMKernel(ck, curve.r.bit_length())
    m = 1 << logc
    rng = np.random.default_rng(0)
    nl = -(-curve.r.bit_length() // LIMB_BITS)
    x = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m),
                                 dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 1 << 16, size=(fq.N, m),
                                 dtype=np.uint32))
    inf = jnp.zeros((m,), dtype=bool)
    s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
    s[-1] &= 0x2FFF
    t0 = time.time()
    out = np.asarray(jax.jit(
        lambda sc: cksum(mk.msm((x, y, inf), sc, 10)[0]))(
            jnp.asarray(s)))
    print(f"OK dense msm: {out} ({time.time()-t0:.0f}s incl compile)",
          flush=True)
