"""End-to-end sp-PCD on the TPU: real inner (BLS12-377) + outer
(BW6-761) device Groth16 proves, zero trapdoors. VERDICT r1 item 4.
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

t0 = time.time()
pk, vk = pcd.generator(cp, num_proofs=1, seed=77)
print(f"# generator done in {time.time()-t0:.1f}s "
      f"(outer circuit keys built)", flush=True)

t0 = time.time()
stmt, inner_proof = pcd.prove_step(
    pk, cp,
    [PCDMessage(type=1, payload=[10, 1]),
     PCDMessage(type=1, payload=[20, 2])],
    PCDLocalData(values=[5]), seed=5)
print(f"# inner prove done in {time.time()-t0:.1f}s", flush=True)
assert pcd.g16_inner.verifier_strong_IC(
    pk.inner_keypair.vk, stmt, inner_proof), "inner proof invalid"
print("# inner proof verifies", flush=True)

t0 = time.time()
proof = pcd.prover(pk, [stmt], [inner_proof], seed=9)
print(f"# outer prove done in {time.time()-t0:.1f}s", flush=True)

assert pcd.verifier(vk, [stmt], proof), "outer proof invalid"
bad = list(stmt)
bad[1] = (bad[1] + 1) % bls.r
assert not pcd.verifier(vk, [bad], proof), "tampered stmt accepted"
print("sp-PCD end-to-end OK: real inner+outer device proofs, "
      "verification + tamper rejection", flush=True)
