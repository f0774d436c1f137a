"""ADSNARK demo (reference zk_proof_systems/ppzkadsnark/
r1cs_ppzkadsnark/examples/demo_r1cs_ppzkadsnark.cpp,
CMakeLists.txt:117-118): generate a synthetic R1CS, authenticate the
input data (Ed25519 public path + symmetric path), prove over the
authenticated data, verify both ways.

usage: demo_r1cs_ppzkadsnark.py <num_constraints> <input_size> [Fr|bytes]
(the reference argv contract, demo_r1cs_ppzkadsnark.cpp:29-41).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "-v":
        print("libsnark_tpu demo_r1cs_ppzkadsnark")
        return 0
    if len(sys.argv) not in (3, 4):
        print(f"usage: {sys.argv[0]} num_constraints input_size [Fr|bytes]")
        return 1
    from libsnark_tpu import get_curve
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.proof_systems.adsnark import ADSNARK
    from libsnark_tpu.profiling import enter_block, start_profiling

    curve = get_curve("alt_bn128")
    num_constraints = int(sys.argv[1])
    input_size = int(sys.argv[2])
    if len(sys.argv) == 4:
        assert sys.argv[3] in ("Fr", "bytes")
        if sys.argv[3] == "bytes":
            input_size = -(-8 * input_size // (curve.r.bit_length() - 1))

    start_profiling()
    with enter_block("Generate R1CS example"):
        cs, primary, aux = generate_r1cs_example(curve.r, num_constraints,
                                                 input_size)

    ads = ADSNARK(curve)
    with enter_block("ADSNARK authentication keygen"):
        keys = ads.auth_generator()

    labels = [f"input{i}".encode() for i in range(len(primary))]
    with enter_block("Authenticate data (Ed25519 + symmetric)"):
        auth = ads.auth_sign(primary, keys.sak, labels)
        assert ads.auth_verify_pub(primary, auth, keys.pak, labels)

    with enter_block("ADSNARK generator"):
        kp = ads.generator(cs, keys.pap)
    with enter_block("ADSNARK prover"):
        proof = ads.prover(kp.pk, primary, aux, auth)
    with enter_block("ADSNARK verifier (symmetric)"):
        ok_sec = ads.verifier_sec(kp.vk, proof, keys.sak, labels)
    with enter_block("ADSNARK verifier (public)"):
        ok_pub = ads.verifier_pub(kp.vk, auth, proof, keys.pak, labels)
    print(f"* Symmetric verification: {'PASS' if ok_sec else 'FAIL'}")
    print(f"* Public verification:    {'PASS' if ok_pub else 'FAIL'}")
    return 0 if (ok_sec and ok_pub) else 1


if __name__ == "__main__":
    sys.exit(main())
