"""TBCS ppzkSNARK profiling harness (reference
profile_tbcs_ppzksnark.cpp).

usage: profile_tbcs_ppzksnark.py [num_gates] [input_size]
"""
import sys
from _common import init_backend, Timed

if __name__ == "__main__":
    ng = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ninp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.relations.examples import generate_tbcs_example
    from libsnark_tpu.proof_systems.tbcs_ppzksnark import TBCSPpzksnark

    curve = get_curve("alt_bn128")
    with Timed("Generate TBCS example"):
        circuit, bits, aux = generate_tbcs_example(ng, ninp)
    ps = TBCSPpzksnark(curve)
    with Timed("Generator"):
        kp = ps.tbcs_generator(circuit, seed=1)
    with Timed("Prover"):
        proof = ps.tbcs_prover(kp.pk, bits, aux, seed=2)
    with Timed("Verifier"):
        ok = ps.tbcs_verifier_strong_IC(kp.vk, bits, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
