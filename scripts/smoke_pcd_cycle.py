"""Host-only structural smoke of the MNT-cycle sp-PCD: builds both
circuits, runs a depth-0 (base) and depth-1 compliance step with
trapdoor translation proofs, checks hash-chain consistency, and
negative-tests corruption. No device proving (that path is exercised by
the slow end-to-end test / TPU artifact)."""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_verifier_gadget import _trapdoor_groth16
from libsnark_tpu.curves import get_curve
from libsnark_tpu.proof_systems.pcd_cycle import CycleSpPCD
from libsnark_tpu.proof_systems.compliance_predicate import (
    TallyCompliancePredicate, PCDMessage, PCDLocalData)
from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
from libsnark_tpu.relations.variable import Variable

t0 = time.time()


def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


pcd = CycleSpPCD()
A, B = pcd.A, pcd.B

# trapdoor-able translation vk: trivial cs over Fr(B) with 1 input,
# satisfied by ([anything], [0])
dummy_cs = R1CSConstraintSystem(B.r, 1, 1)
w = Variable(2)
dummy_cs.add_constraint(w * 1, w * 1, w * 1, "w_bool")
vk_b, _ = _trapdoor_groth16(B, dummy_cs, [123], [0], seed=7)
log(f"trapdoor vk_b ready")

handler = TallyCompliancePredicate(A.r, max_arity=1)
handler.generate_r1cs_constraints()
handler_cs = handler.get_constraint_system()
log(f"handler cs: {len(handler_cs.constraints)} constraints")

C = pcd.build_compliance_circuit(handler_cs, 1, len(handler.outgoing))
log(f"compliance circuit: {len(C['pb'].constraints)} constraints, "
    f"{C['pb'].num_variables} vars")

# ---- depth 0 (base case) --------------------------------------------------
h0 = TallyCompliancePredicate(A.r, max_arity=1)
h0.generate_r1cs_constraints()
pcd.witness_compliance(C, h0, vk_b, [], [], PCDLocalData(values=[5]))
bad = C["pb"].first_unsatisfied()
assert bad is None, f"base-case compliance unsatisfied: {bad}"
msg0 = PCDMessage(type=1, payload=[C["pb"].val(C["out_block"][1]),
                                   C["pb"].val(C["out_block"][2])])
h_out0 = C["pb"].primary_input()[0]
assert msg0.payload == [5, 1]
log(f"depth-0 compliance satisfied; msg0={msg0.payload}")

# host/in-circuit hash consistency
assert h_out0 == pcd.message_hash(vk_b, msg0), "hash chain mismatch"
log("host CRH == in-circuit CRH")

# keep the full witness for the translation-side trapdoor below
cs_a = C["pb"].get_constraint_system()
aux_a = C["pb"].auxiliary_input()

# ---- depth 1 --------------------------------------------------------------
_, pi_b0 = _trapdoor_groth16(B, dummy_cs, [h_out0], [0], seed=7)
C1 = pcd.build_compliance_circuit(handler_cs, 1, len(handler.outgoing))
h1 = TallyCompliancePredicate(A.r, max_arity=1)
h1.generate_r1cs_constraints()
pcd.witness_compliance(C1, h1, vk_b, [msg0], [pi_b0],
                       PCDLocalData(values=[10]))
bad = C1["pb"].first_unsatisfied()
assert bad is None, f"depth-1 compliance unsatisfied: {bad}"
msg1 = PCDMessage(type=1, payload=[C1["pb"].val(C1["out_block"][1]),
                                   C1["pb"].val(C1["out_block"][2])])
assert msg1.payload == [15, 2], msg1.payload
log(f"depth-1 compliance satisfied; msg1={msg1.payload}")

# ---- negative: proof for the WRONG statement ------------------------------
_, pi_bad = _trapdoor_groth16(B, dummy_cs, [(h_out0 + 1) % B.r], [0],
                              seed=7)
C2 = pcd.build_compliance_circuit(handler_cs, 1, len(handler.outgoing))
h2 = TallyCompliancePredicate(A.r, max_arity=1)
h2.generate_r1cs_constraints()
pcd.witness_compliance(C2, h2, vk_b, [msg0], [pi_bad],
                       PCDLocalData(values=[10]))
assert C2["pb"].first_unsatisfied() is not None, \
    "wrong-statement proof must NOT satisfy"
log("corrupted incoming proof correctly rejected")

# ---- translation circuit --------------------------------------------------
vk_a, pi_a = _trapdoor_groth16(A, cs_a, [h_out0], aux_a, seed=11)
T = pcd.build_translation_circuit(vk_a)
log(f"translation circuit: {len(T['pb'].constraints)} constraints")
pcd.witness_translation(T, h_out0, pi_a)
bad = T["pb"].first_unsatisfied()
assert bad is None, f"translation unsatisfied: {bad}"
log("translation circuit satisfied with trapdoor compliance proof")

T2 = pcd.build_translation_circuit(vk_a)
pcd.witness_translation(T2, (h_out0 + 1) % B.r, pi_a)
assert T2["pb"].first_unsatisfied() is not None
log("translation rejects wrong statement")

print("SMOKE_PCD_CYCLE_OK")
