"""DFGK14 (uscs_ppzksnark) profiling harness.

Reference: libsnark/zk_proof_systems/ppzksnark/uscs_ppzksnark/profiling/
profile_uscs_ppzksnark.cpp (present upstream, left out of the default
CMake build -- included here for a complete L7 surface).

usage: profile_uscs_ppzksnark.py <num_constraints> <input_size> [Fr|bytes]
"""
from _common import Timed, init_backend, parse_std_args

if __name__ == "__main__":
    nc, ninp = parse_std_args()
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.relations.examples import generate_uscs_example
    from libsnark_tpu.proof_systems.dfgk14 import DFGK14

    curve = get_curve("alt_bn128")
    with Timed("Generate USCS example"):
        cs, primary, aux = generate_uscs_example(curve.r, nc, ninp)
    system = DFGK14(curve)
    with Timed("Generator"):
        kp = system.generator(cs, seed=1)
    with Timed("Prover"):
        proof = system.prover(kp.pk, primary, aux, seed=2)
    with Timed("Verifier"):
        ok = system.verifier_strong_IC(kp.vk, primary, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
    bad = system.verifier_strong_IC(
        kp.vk, [(primary[0] + 1) % curve.r] + list(primary[1:]), proof)
    print(f"tampered-input result: {'FAIL (expected)' if not bad else 'BUG'}")
    assert not bad
