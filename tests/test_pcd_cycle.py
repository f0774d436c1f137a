"""MNT-cycle sp-PCD (proof_systems/pcd_cycle.py; reference
r1cs_sp_ppzkpcd + sp_pcd_circuits, the unbounded-depth recursion over
common/default_types/r1cs_ppzkpcd_pp.hpp's MNT4/MNT6 cycle).

Host-level: circuit construction, hash-chain consistency, satisfaction
with trapdoor proofs, corruption rejection. Device proving of the same
circuits is exercised by scripts/e2e_pcd_cycle.py (TPU artifact).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from libsnark_tpu.proof_systems.pcd_cycle import (
    CycleSpPCD, constrain_bits_lt_const)
from libsnark_tpu.proof_systems.compliance_predicate import (
    TallyCompliancePredicate, PCDMessage, PCDLocalData)
from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
from libsnark_tpu.relations.variable import Variable
from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray


@pytest.fixture(scope="module")
def pcd():
    return CycleSpPCD()


def _dummy_vk(curve, statement, seed=7):
    """Trapdoor (vk, proof) under a trivial always-satisfiable cs with
    one primary input (same seed => same vk across calls)."""
    from test_verifier_gadget import _trapdoor_groth16
    cs = R1CSConstraintSystem(curve.r, 1, 1)
    w = Variable(2)
    cs.add_constraint(w * 1, w * 1, w * 1, "w_bool")
    return _trapdoor_groth16(curve, cs, [statement % curve.r], [0],
                             seed=seed)


def test_lt_const_gadget():
    p = (1 << 61) - 1
    c = 0b1011010
    for v in (0, 1, c - 1, c, c + 1, 100):
        pb = Protoboard(p)
        bits = PBVariableArray().allocate(pb, 7, "b")
        for j, b in enumerate(bits):
            pb.setval(b, (v >> j) & 1)
        wit = constrain_bits_lt_const(pb, list(bits), c)
        wit()
        assert (pb.first_unsatisfied() is None) == (v < c), v


def test_translation_circuit(pcd):
    """C_B: hardcoded-vk mnt4 verifier over bits of the statement."""
    from test_verifier_gadget import _trapdoor_groth16
    A, B = pcd.A, pcd.B
    h = 0x1234567890ABCDEF
    vk_a, pi_a = _dummy_vk(A, h, seed=11)
    T = pcd.build_translation_circuit(vk_a)
    pcd.witness_translation(T, h, pi_a)
    assert T["pb"].first_unsatisfied() is None
    T2 = pcd.build_translation_circuit(vk_a)
    pcd.witness_translation(T2, h + 1, pi_a)
    assert T2["pb"].first_unsatisfied() is not None


@pytest.mark.slow
def test_compliance_chain_with_trapdoor_translation(pcd):
    """Depth-0 (base) and depth-1 compliance steps; host CRH equals the
    in-circuit CRH; wrong-statement incoming proofs rejected."""
    A, B = pcd.A, pcd.B
    vk_b, _ = _dummy_vk(B, 123)
    handler = TallyCompliancePredicate(A.r, max_arity=1)
    handler.generate_r1cs_constraints()
    handler_cs = handler.get_constraint_system()
    msg_size = len(handler.outgoing)

    C = pcd.build_compliance_circuit(handler_cs, 1, msg_size)
    h0 = TallyCompliancePredicate(A.r, max_arity=1)
    h0.generate_r1cs_constraints()
    pcd.witness_compliance(C, h0, vk_b, [], [], PCDLocalData(values=[5]))
    assert C["pb"].first_unsatisfied() is None
    msg0 = PCDMessage(type=1, payload=[C["pb"].val(C["out_block"][1]),
                                       C["pb"].val(C["out_block"][2])])
    h_out0 = C["pb"].primary_input()[0]
    assert msg0.payload == [5, 1]
    assert h_out0 == pcd.message_hash(vk_b, msg0)

    _, pi_b0 = _dummy_vk(B, h_out0)
    C1 = pcd.build_compliance_circuit(handler_cs, 1, msg_size)
    h1 = TallyCompliancePredicate(A.r, max_arity=1)
    h1.generate_r1cs_constraints()
    pcd.witness_compliance(C1, h1, vk_b, [msg0], [pi_b0],
                           PCDLocalData(values=[10]))
    assert C1["pb"].first_unsatisfied() is None
    assert C1["pb"].val(C1["out_block"][1]) == 15

    _, pi_bad = _dummy_vk(B, h_out0 + 1)
    C2 = pcd.build_compliance_circuit(handler_cs, 1, msg_size)
    h2 = TallyCompliancePredicate(A.r, max_arity=1)
    h2.generate_r1cs_constraints()
    pcd.witness_compliance(C2, h2, vk_b, [msg0], [pi_bad],
                           PCDLocalData(values=[10]))
    assert C2["pb"].first_unsatisfied() is not None
