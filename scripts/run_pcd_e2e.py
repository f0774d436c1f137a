"""End-to-end sp-PCD on the TPU: real inner (BLS12-377) + outer
(BW6-761) device Groth16 proves, zero trapdoors. VERDICT r1 item 4;
r5: records the committed artifact PCD_E2E.json (circuit sizes,
per-phase timings, verify + tamper results).
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
if jax.default_backend() == "cpu" and _retry < 10:
    print(f"# tpu init failed (attempt {_retry}); retrying", file=sys.stderr)
    os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
    time.sleep(8)
    os.execv(sys.executable, [sys.executable] + sys.argv)

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu import get_curve
from libsnark_tpu.proof_systems.pcd import SpPCD
from libsnark_tpu.proof_systems.compliance_predicate import (
    TallyCompliancePredicate, PCDMessage, PCDLocalData)

bls = get_curve("bls12_377")
bw6 = get_curve("bw6_761")
pcd = SpPCD(bls, bw6)

cp = TallyCompliancePredicate(bls.r, max_arity=2)
cp.generate_r1cs_constraints()
print(f"# step circuit: {cp.pb.num_constraints} constraints", flush=True)
art = {"backend": jax.default_backend(),
       "step_constraints": cp.pb.num_constraints,
       "trapdoors_used": 0}

t0 = time.time()
pk, vk = pcd.generator(cp, num_proofs=1, seed=77)
art["generator_s"] = round(time.time() - t0, 1)
art["inner_constraints"] = pk.inner_cs.num_constraints \
    if hasattr(pk, "inner_cs") else None
print(f"# generator done in {art['generator_s']}s "
      f"(outer circuit keys built)", flush=True)

t0 = time.time()
stmt, inner_proof = pcd.prove_step(
    pk, cp,
    [PCDMessage(type=1, payload=[10, 1]),
     PCDMessage(type=1, payload=[20, 2])],
    PCDLocalData(values=[5]), seed=5)
art["inner_prove_s"] = round(time.time() - t0, 1)
print(f"# inner prove done in {art['inner_prove_s']}s", flush=True)
assert pcd.g16_inner.verifier_strong_IC(
    pk.inner_keypair.vk, stmt, inner_proof), "inner proof invalid"
print("# inner proof verifies", flush=True)

t0 = time.time()
proof = pcd.prover(pk, [stmt], [inner_proof], seed=9)
art["outer_prove_s"] = round(time.time() - t0, 1)
print(f"# outer prove done in {art['outer_prove_s']}s", flush=True)

t0 = time.time()
ok = pcd.verifier(vk, [stmt], proof)
art["verify_s"] = round(time.time() - t0, 1)
assert ok, "outer proof invalid"
bad = list(stmt)
bad[1] = (bad[1] + 1) % bls.r
tampered = pcd.verifier(vk, [bad], proof)
assert not tampered, "tampered stmt accepted"
art["verify"] = True
art["tampered_rejected"] = True
art["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(_repo, "PCD_E2E.json"), "w") as f:
    json.dump({"sp_pcd_one_layer_bls377_bw6": art}, f, indent=1)
print("sp-PCD end-to-end OK: real inner+outer device proofs, "
      "verification + tamper rejection; artifact PCD_E2E.json written",
      flush=True)
