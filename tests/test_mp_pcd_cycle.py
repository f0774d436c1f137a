"""Unbounded multi-predicate PCD over the MNT cycle
(proof_systems/mp_pcd_cycle.py; reference r1cs_mp_ppzkpcd +
mp_pcd_circuits): vk-set commitment binding, cross-predicate chaining,
non-member-vk rejection. Host-level with trapdoor translation proofs
(the device prover path is shared with pcd_cycle/Groth16)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from libsnark_tpu.proof_systems.mp_pcd_cycle import CycleMpPCD
from libsnark_tpu.proof_systems.compliance_predicate import (
    TallyCompliancePredicate, PCDMessage, PCDLocalData)
from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
from libsnark_tpu.relations.variable import Variable


@pytest.fixture(scope="module")
def mp():
    return CycleMpPCD()


def _dummy_vk(curve, statement, seed=7):
    from test_verifier_gadget import _trapdoor_groth16
    cs = R1CSConstraintSystem(curve.r, 1, 1)
    w = Variable(2)
    cs.add_constraint(w * 1, w * 1, w * 1, "w_bool")
    return _trapdoor_groth16(curve, cs, [statement % curve.r], [0],
                             seed=seed)


def test_accumulator_and_hash(mp):
    vk0, _ = _dummy_vk(mp.B, 1, seed=21)
    vk1, _ = _dummy_vk(mp.B, 2, seed=22)
    acc = mp.build_accumulator(2)
    acc.add(mp._pvk_bits(vk0))
    acc.add(mp._pvk_bits(vk1))
    root = acc.get_commitment()
    m0 = acc.get_membership_proof(mp._pvk_bits(vk0))
    m1 = acc.get_membership_proof(mp._pvk_bits(vk1))
    assert m0.address != m1.address
    msg = PCDMessage(type=1, payload=[3, 4])
    h = mp.message_hash(root, msg)
    assert 0 <= h < mp.A.r
    # root-dependent (set binding)
    acc2 = mp.build_accumulator(2)
    acc2.add(mp._pvk_bits(vk1))
    assert mp.message_hash(acc2.get_commitment(), msg) != h


@pytest.mark.slow
def test_mp_cycle_compliance_with_membership(mp):
    """Base + successor compliance steps with the vk-set commitment:
    satisfied with a committed vk's trapdoor proof; rejected for a
    wrong-statement proof AND for a valid proof under a NON-member vk
    (the property that distinguishes mp from sp)."""
    A, B = mp.A, mp.B
    vk0, _ = _dummy_vk(B, 0, seed=31)
    vk1, _ = _dummy_vk(B, 0, seed=32)
    acc = mp.build_accumulator(2)
    acc.add(mp._pvk_bits(vk0))
    acc.add(mp._pvk_bits(vk1))
    root = acc.get_commitment()
    memb0 = acc.get_membership_proof(mp._pvk_bits(vk0))

    handler = TallyCompliancePredicate(A.r, max_arity=1)
    handler.generate_r1cs_constraints()
    cs = handler.get_constraint_system()
    msg_size = len(handler.outgoing)

    # base step (predicate 0)
    C = mp.build_compliance_circuit(cs, 1, msg_size, depth=1)
    h0 = TallyCompliancePredicate(A.r, max_arity=1)
    h0.generate_r1cs_constraints()
    mp.witness_compliance(C, h0, root, [], [(vk0, memb0, None)],
                          PCDLocalData(values=[5]))
    assert C["pb"].first_unsatisfied() is None
    msg0 = PCDMessage(type=1, payload=[C["pb"].val(C["out_block"][1]),
                                       C["pb"].val(C["out_block"][2])])
    h_out0 = C["pb"].primary_input()[0]
    assert h_out0 == mp.message_hash(root, msg0)

    # successor consuming a proof produced "by predicate 0"
    _, pi0 = _dummy_vk(B, h_out0, seed=31)
    C1 = mp.build_compliance_circuit(cs, 1, msg_size, depth=1)
    h1 = TallyCompliancePredicate(A.r, max_arity=1)
    h1.generate_r1cs_constraints()
    mp.witness_compliance(C1, h1, root, [msg0], [(vk0, memb0, pi0)],
                          PCDLocalData(values=[10]))
    assert C1["pb"].first_unsatisfied() is None
    assert C1["pb"].val(C1["out_block"][1]) == 15

    # wrong-statement proof
    _, pi_bad = _dummy_vk(B, h_out0 + 1, seed=31)
    C2 = mp.build_compliance_circuit(cs, 1, msg_size, depth=1)
    h2 = TallyCompliancePredicate(A.r, max_arity=1)
    h2.generate_r1cs_constraints()
    mp.witness_compliance(C2, h2, root, [msg0], [(vk0, memb0, pi_bad)],
                          PCDLocalData(values=[10]))
    assert C2["pb"].first_unsatisfied() is not None

    # valid proof under a NON-member vk: membership path cannot check
    # out against OUR root
    vk_evil, _ = _dummy_vk(B, 0, seed=66)
    acc_evil = mp.build_accumulator(2)
    acc_evil.add(mp._pvk_bits(vk_evil))
    memb_evil = acc_evil.get_membership_proof(mp._pvk_bits(vk_evil))
    h_evil = mp.message_hash(root, msg0)
    _, pi_evil = _dummy_vk(B, h_evil, seed=66)
    C3 = mp.build_compliance_circuit(cs, 1, msg_size, depth=1)
    h3 = TallyCompliancePredicate(A.r, max_arity=1)
    h3.generate_r1cs_constraints()
    mp.witness_compliance(C3, h3, root, [msg0],
                          [(vk_evil, memb_evil, pi_evil)],
                          PCDLocalData(values=[10]))
    assert C3["pb"].first_unsatisfied() is not None
