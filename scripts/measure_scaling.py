"""Sharded MSM + four-step NTT scaling measurement on the virtual CPU
mesh (VERDICT r1 item 6).

HONESTY NOTE (recorded in the output): this box exposes ONE physical
core, so an 8-virtual-device mesh executes device programs serially --
wall-clock "speedup" is structurally impossible here. What this measures
is the SHARDING OVERHEAD: T(mesh=8) / T(mesh=1) on identical global
work. Overhead ~1.0 means the distributed program adds little beyond
the collectives; real N-chip efficiency = 1 / overhead at ICI speeds
is the quantity the ≥70% BASELINE target concerns, and needs N real
chips to measure directly.

Run with the vanilla-CPU env (see conftest header).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache_local")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel
from libsnark_tpu.ops.limbs import LIMB_BITS
from libsnark_tpu.parallel.msm_sharded import sharded_msm, pad_for_mesh
from libsnark_tpu.parallel.ntt_sharded import FourStepDomain

log2m = int(os.environ.get("SCALE_LOG2", "12"))
m = 1 << log2m
curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
fr = FpKernel(curve.fr_params)
ck = CurveKernel(fq, "G1")
mk = MSMKernel(ck, curve.r.bit_length())
nl = -(-curve.r.bit_length() // LIMB_BITS)
rng = np.random.default_rng(0)

x = jnp.asarray(rng.integers(0, 1 << 16, size=(16, m), dtype=np.uint32)
                ).at[15].set(0)
y = jnp.asarray(rng.integers(0, 1 << 16, size=(16, m), dtype=np.uint32)
                ).at[15].set(0)
inf = jnp.zeros((m,), bool)
sc = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
sc[-1] &= 0x2FFF
sc = jnp.asarray(sc)


def timeit(fn, *args, iters=3):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(iters):
        t0 = time.monotonic()
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.monotonic() - t0)
    return min(ts)


results = {"note": ("single-core host: 8 virtual devices run serially; "
                    "ratio measures sharding overhead, not speedup"),
           "log2m": log2m}

for D in (1, 8):
    devs = np.array(jax.devices()[:D])
    mesh = Mesh(devs, ("dp",))
    with mesh:
        pts, s2 = pad_for_mesh((x, y, inf), sc, D)
        t = timeit(lambda: sharded_msm(mk, mesh, "dp", pts, s2, c=8,
                                       method="simple"))
    results[f"msm_simple_mesh{D}_s"] = round(t, 4)
    print(f"msm simple mesh={D}: {t:.3f}s", flush=True)

for D in (1, 8):
    devs = np.array(jax.devices()[:D])
    mesh = Mesh(devs, ("dp",))
    dom = FourStepDomain(fr, curve.fr_params, log2m, mesh, "dp")
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(nl, m),
                                 dtype=np.uint32)).at[nl - 1].set(0)
    with mesh:
        jfn = jax.jit(lambda v: jnp.sum(dom.ifft(v), dtype=jnp.uint32))
        t = timeit(jfn, a)
    results[f"ntt_mesh{D}_s"] = round(t, 4)
    print(f"four-step ifft mesh={D}: {t:.3f}s", flush=True)

results["msm_overhead_ratio"] = round(
    results["msm_simple_mesh8_s"] / results["msm_simple_mesh1_s"], 3)
results["ntt_overhead_ratio"] = round(
    results["ntt_mesh8_s"] / results["ntt_mesh1_s"], 3)
with open("/root/repo/SCALING_RESULTS.json", "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results, indent=1))
