"""End-to-end MNT-cycle sp-PCD on the accelerator: REAL device Groth16
proves on BOTH cycle curves, unbounded-depth chain, zero trapdoors
(reference r1cs_sp_ppzkpcd run, profile_r1cs_sp_ppzkpcd.cpp shape).

Chain: base step (depth 0) -> step (depth 1) -> verify. Each step is a
compliance prove over MNT4 (~110k constraints) plus a translation prove
over MNT6 (~29k constraints).

Writes PCD_CYCLE_E2E.json on success. Expect long first-run compiles.
"""
import json
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

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_root,
                               ".jax_cache" if jax.default_backend() == "cpu"
                               else ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu.proof_systems.pcd_cycle import CycleSpPCD
from libsnark_tpu.proof_systems.compliance_predicate import (
    TallyCompliancePredicate, PCDLocalData)

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)


log(f"backend: {jax.default_backend()}")
pcd = CycleSpPCD()
A = pcd.A

handler = TallyCompliancePredicate(A.r, max_arity=1)
handler.generate_r1cs_constraints()

log("generator: building + keygen over both curves ...")
# PCD_E2E_HOST_KEYGEN=1: pure-Python fixed-base keygen (skips the
# fixed-base device programs -- the right trade on the single local
# CPU core; proving stays on the device path either way)
pk, vk = pcd.generator(handler, seed=42,
                       host_keygen=os.environ.get(
                           "PCD_E2E_HOST_KEYGEN") == "1")
t_gen = time.time() - t0
log(f"generator done ({t_gen:.1f}s)")

h0 = TallyCompliancePredicate(A.r, max_arity=1)
h0.generate_r1cs_constraints()
t1 = time.time()
p0 = pcd.prover(pk, h0, [], PCDLocalData(values=[5]), seed=1)
t_step0 = time.time() - t1
log(f"depth-0 step proved ({t_step0:.1f}s): msg={p0.msg.payload}")
assert pcd.verifier(vk, p0.msg, p0), "depth-0 PCD proof must verify"
log("depth-0 PCD proof verifies")

h1 = TallyCompliancePredicate(A.r, max_arity=1)
h1.generate_r1cs_constraints()
t1 = time.time()
p1 = pcd.prover(pk, h1, [p0], PCDLocalData(values=[10]), seed=2)
t_step1 = time.time() - t1
log(f"depth-1 step proved ({t_step1:.1f}s): msg={p1.msg.payload}")
assert p1.msg.payload == [15, 2]
assert pcd.verifier(vk, p1.msg, p1), "depth-1 PCD proof must verify"
log("depth-1 PCD proof verifies (REAL unbounded-cycle recursion)")

from libsnark_tpu.proof_systems.compliance_predicate import PCDMessage
bad = PCDMessage(type=1, payload=[16, 2])
assert not pcd.verifier(vk, bad, p1), "wrong message must not verify"
log("corrupted message rejected")

out = dict(ok=True, backend=jax.default_backend(),
           generator_s=round(t_gen, 1), step0_s=round(t_step0, 1),
           step1_s=round(t_step1, 1),
           ts=time.strftime("%Y-%m-%d %H:%M:%S"))
with open(os.path.join(_root, "PCD_CYCLE_E2E.json"), "w") as f:
    json.dump(out, f, indent=1)
print("PCD_CYCLE_E2E_OK", json.dumps(out))
