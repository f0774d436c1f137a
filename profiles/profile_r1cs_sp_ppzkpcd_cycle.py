"""MNT-cycle sp-PCD profiling harness (reference
profile_r1cs_sp_ppzkpcd.cpp at its ACTUAL default instantiation, the
MNT4/MNT6 cycle of r1cs_ppzkpcd_pp.hpp:27-38): tally chain of the given
depth with REAL device Groth16 proofs alternating between the two
curves — unbounded recursion, zero trapdoors.

usage: profile_r1cs_sp_ppzkpcd_cycle.py [depth]
"""
import sys
from _common import init_backend, Timed

if __name__ == "__main__":
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    init_backend()
    from libsnark_tpu.proof_systems.pcd_cycle import CycleSpPCD
    from libsnark_tpu.proof_systems.compliance_predicate import (
        TallyCompliancePredicate, PCDLocalData)

    pcd = CycleSpPCD()
    cp = TallyCompliancePredicate(pcd.A.r, max_arity=1)
    cp.generate_r1cs_constraints()
    with Timed("Generator (compliance A + translation B keys)"):
        pk, vk = pcd.generator(cp, seed=7)
    proof = None
    for d in range(depth):
        h = TallyCompliancePredicate(pcd.A.r, max_arity=1)
        h.generate_r1cs_constraints()
        with Timed(f"PCD step depth={d} (prove A + translate B)"):
            proof = pcd.prover(pk, h, [proof] if proof else [],
                               PCDLocalData(values=[d + 1]), seed=3 + d)
        print(f"  msg: {proof.msg.payload}")
    with Timed("Verifier (one pairing check over B)"):
        ok = pcd.verifier(vk, proof.msg, proof)
    print(f"verified: {ok}")
    assert ok
