"""Probe the 2^20-scale witness-map transforms on the real chip (r4):
the groth20 BASELINE run crashed the TPU worker; the segmented fused
MSM at 2^20 is clean (sweep_msm_c), so bisect the NTT/witness-map side.

usage: probe_ntt20.py [logn]
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
from libsnark_tpu.ops.ntt import Radix2Domain

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
curve = get_curve("alt_bn128")
fr = FpKernel(curve.fr_params)
dom = Radix2Domain(fr, curve.fr_params, logn)
n = 1 << logn
print(f"# backend={jax.default_backend()} n=2^{logn}", flush=True)

rng = np.random.default_rng(0)
dt = dom.device_tables()


def cksum(v):
    return jnp.sum(v.astype(jnp.uint32), dtype=jnp.uint32)


def step(name, fn):
    t0 = time.time()
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(fr.N, n),
                                 dtype=np.uint32))
    out = np.asarray(jax.jit(fn)(a))
    print(f"OK {name}: {out} ({time.time()-t0:.1f}s incl compile)",
          flush=True)


step("ifft", lambda a: cksum(dom.ifft(a, dt)))
step("coset_fft(ifft)", lambda a: cksum(
    dom.coset_fft(dom.ifft(a, dt), dt=dt)))
step("icoset_fft_divz", lambda a: cksum(dom.icoset_fft_divz(a, dt)))
step("stacked wm-shape ifft+coset", lambda a: cksum(
    dom.coset_fft(dom.ifft(
        jnp.stack([a, a, a], axis=-2), dt), dt=dt)))
