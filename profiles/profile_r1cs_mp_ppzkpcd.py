"""mp-PCD profiling harness (reference profile_r1cs_mp_ppzkpcd.cpp):
two tally predicates aggregated under a committed vk set with REAL
device proofs over the one-layer BLS12-377 -> BW6-761 substitution
(proof_systems/mp_pcd.py; the unbounded MNT-cycle variant lives in
mp_pcd_cycle.py with its own structural tests).

usage: profile_r1cs_mp_ppzkpcd.py [num_proofs]
"""
import sys

from _common import init_backend, Timed

if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.proof_systems.mp_pcd import MpPCD
    from libsnark_tpu.proof_systems.compliance_predicate import (
        TallyCompliancePredicate, PCDMessage, PCDLocalData)

    bls = get_curve("bls12_377")
    bw6 = get_curve("bw6_761")
    mp = MpPCD(bls, bw6)

    def handler():
        h = TallyCompliancePredicate(bls.r, max_arity=1)
        h.generate_r1cs_constraints()
        return h

    handlers = {"tally_a": handler(), "tally_b": handler()}
    with Timed(f"Generator ({len(handlers)} predicates, vk set)"):
        pk, vk = mp.generator(handlers, num_proofs=k, seed=7)
    steps = []
    with Timed(f"Inner proves x{k} (alternating predicates)"):
        for i in range(k):
            name = "tally_a" if i % 2 == 0 else "tally_b"
            hw = handler()
            hw.generate_r1cs_witness(
                [PCDMessage(type=1, payload=[10 + i, 1])],
                PCDLocalData(values=[5 + i]))
            primary = hw.pb.primary_input()
            pi = mp.g16_inner.prover(pk.inner_keypairs[name].pk,
                                     primary, hw.pb.auxiliary_input(),
                                     seed=3 + i)
            steps.append((name, primary, pi))
    with Timed("Outer prove (vk-membership aggregation)"):
        proof = mp.prover(pk, steps, seed=11)
    with Timed("Verifier"):
        ok = mp.verifier(vk, [s for _, s, _ in steps], proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
