"""Probe raw VPU op rates inside a Pallas kernel on the real chip:
u32 add / u32 mul / u32 shift+and / u16-range mul, on (S, L) tiles.

usage: probe_vpu_ops.py [K] [S] [L]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax
import jax.numpy as jnp
import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_tpu"
                               if jax.default_backend() == "tpu"
                               else ".jax_cache_local"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from jax.experimental import pallas as pl

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
L = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
print(f"# backend={jax.default_backend()} K={K} S={S} L={L}", flush=True)


def build(op):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]

        def step(_, ab):
            a, b = ab
            return op(a, b), a
        a, b = jax.lax.fori_loop(0, K, step, (a, b))
        o_ref[...] = a

    spec = pl.BlockSpec((S, L), lambda: (0, 0))

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((S, L), jnp.uint32),
            in_specs=[spec, spec], out_specs=spec)(a, b)
    return call


rng = np.random.default_rng(0)
a0 = jnp.asarray(rng.integers(0, 1 << 16, (S, L), dtype=np.uint32))
b0 = jnp.asarray(rng.integers(1, 1 << 16, (S, L), dtype=np.uint32))

OPS = [
    ("add", lambda a, b: a + b),
    ("mul", lambda a, b: a * b),
    ("mul16lo", lambda a, b: ((a & 0xFFFF) * (b & 0xFFFF)) & 0xFFFF),
    ("shift+and", lambda a, b: (a >> 7) & b),
    ("mulhi_split", lambda a, b: (a * b) >> 16),
    ("f32mul", lambda a, b: (a.astype(jnp.float32)
                             * b.astype(jnp.float32)).astype(jnp.uint32)),
]

for name, op in OPS:
    fn = build(op)
    np.asarray(fn(a0, b0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(a0, b0))
        best = min(best, time.perf_counter() - t0)
    n = K * S * L
    print(f"{name:12s} {best*1e3:8.2f} ms  {n/best/1e9:8.2f} G op/s",
          flush=True)
