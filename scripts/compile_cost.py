"""Measure cold XLA:CPU compile cost of the core programs, one at a time.

Usage:  python scripts/compile_cost.py <what> [xla_extra_flags...]
  what in {mul, add, msm_simple, msm, wm, dryrun_msm}

Runs in THIS process on the vanilla local cpu backend (caller must strip
the axon env; see tests/conftest.py header) with NO persistent cache, and
prints one JSON line {"what":..., "trace_s":..., "compile_s":..., "run_s":...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

what = sys.argv[1] if len(sys.argv) > 1 else "mul"
extra = " ".join(sys.argv[2:])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = (flags + " " + extra).strip()
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax
import jax.numpy as jnp
import numpy as np

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel

curve = get_curve("alt_bn128")
fk = FpKernel(curve.fr_params)
fq = FpKernel(curve.fq_params)
g1 = CurveKernel(fq, f"{curve.name}.G1")
msm_g1 = MSMKernel(g1, curve.r.bit_length())


def timed(fn, *args):
    t0 = time.perf_counter()
    traced = jax.jit(fn).trace(*args)
    t1 = time.perf_counter()
    ex = traced.lower().compile()
    t2 = time.perf_counter()
    out = ex(*args)
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    return dict(trace_s=round(t1 - t0, 3), compile_s=round(t2 - t1, 3),
                run_s=round(t3 - t2, 3))


if what == "mul":
    a = jnp.asarray(fk.encode(list(range(1, 65))))
    res = timed(lambda x: fk.mul(x, x), a)
elif what == "add":
    a = jnp.asarray(fk.encode(list(range(1, 65))))
    res = timed(lambda x: fk.add(x, x), a)
elif what in ("msm_simple", "msm"):
    from libsnark_tpu.ops.limbs import ints_to_limbs
    g16_msm = msm_g1
    pts = g1.encode_points([curve.G1.one() * i for i in range(1, 65)],
                           jacobian=False)
    sc = jnp.asarray(ints_to_limbs(list(range(1, 65)), 16))
    if what == "msm_simple":
        res = timed(lambda p, s: g16_msm.msm_simple(p, s), pts, sc)
    else:
        res = timed(lambda p, s: g16_msm.msm(p, s, 6), pts, sc)
elif what == "wm":
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.reductions.r1cs_to_qap import qap_domain, qap_witness_map
    cs, primary, aux = generate_r1cs_example(curve.r, 48, 2)
    domain = qap_domain(fk, curve.fr_params, cs)
    dev = cs.to_device(fk)
    full = [1] + primary + aux
    am = jnp.asarray(fk.encode(full))
    res = timed(lambda a, d, t: qap_witness_map(dev, domain, a, d, t),
                am, dev.device_arrays(), domain.device_tables())
else:
    raise SystemExit(f"unknown what: {what}")

res["what"] = what
res["extra"] = extra
print(json.dumps(res), flush=True)
