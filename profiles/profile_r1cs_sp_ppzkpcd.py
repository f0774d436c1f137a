"""sp-PCD profiling harness (reference profile_r1cs_sp_ppzkpcd.cpp):
tally-predicate chain with REAL inner/outer device proofs over the
one-layer BLS12-377 -> BW6-761 substitution (see pcd.py header for the
MNT-cycle scoping note).

usage: profile_r1cs_sp_ppzkpcd.py [num_proofs]
"""
import sys
from _common import init_backend, Timed

if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.proof_systems.pcd import SpPCD
    from libsnark_tpu.proof_systems.compliance_predicate import (
        TallyCompliancePredicate, PCDMessage, PCDLocalData)

    bls = get_curve("bls12_377")
    bw6 = get_curve("bw6_761")
    pcd = SpPCD(bls, bw6)
    cp = TallyCompliancePredicate(bls.r, max_arity=2)
    cp.generate_r1cs_constraints()
    with Timed("Generator (inner + outer keys)"):
        pk, vk = pcd.generator(cp, num_proofs=k, seed=7)
    stmts, proofs = [], []
    with Timed(f"Inner proves x{k}"):
        for i in range(k):
            cpw = TallyCompliancePredicate(bls.r, max_arity=2)
            cpw.generate_r1cs_constraints()
            s, pi = pcd.prove_step(
                pk, cpw,
                [PCDMessage(type=1, payload=[10 + i, 1])],
                PCDLocalData(values=[5 + i]), seed=3 + i)
            stmts.append(s)
            proofs.append(pi)
    with Timed("Outer prove (aggregation)"):
        proof = pcd.prover(pk, stmts, proofs, seed=11)
    with Timed("Verifier"):
        ok = pcd.verifier(vk, stmts, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
