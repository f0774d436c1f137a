"""BACS ppzkSNARK profiling harness (reference
profile_bacs_ppzksnark.cpp).

usage: profile_bacs_ppzksnark.py [num_gates] [input_size]
"""
import sys
from _common import init_backend, Timed

if __name__ == "__main__":
    ng = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ninp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.relations.examples import generate_bacs_example
    from libsnark_tpu.proof_systems.bacs_ppzksnark import BACSPpzksnark

    curve = get_curve("alt_bn128")
    with Timed("Generate BACS example"):
        circuit, primary, aux = generate_bacs_example(curve.r, ng, ninp)
    ps = BACSPpzksnark(curve)
    with Timed("Generator"):
        kp = ps.bacs_generator(circuit, seed=1)
    with Timed("Prover"):
        proof = ps.bacs_prover(kp.pk, primary, aux, seed=2)
    with Timed("Verifier"):
        ok = ps.verifier_strong_IC(kp.vk, primary, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
