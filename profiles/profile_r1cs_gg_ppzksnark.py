"""Groth16 profiling harness (reference
profile_r1cs_gg_ppzksnark.cpp:41-77).

usage: profile_r1cs_gg_ppzksnark.py <num_constraints> <input_size> [Fr|bytes]
"""
from _common import parse_std_args, profile_r1cs_system


def _serialize(curve, kp, proof):
    from libsnark_tpu.serialization import Codec, reserialize
    codec = Codec(curve)
    return reserialize(codec, codec.write_groth16_proof,
                       codec.read_groth16_proof, proof)


if __name__ == "__main__":
    nc, ninp = parse_std_args()
    from libsnark_tpu.proof_systems.groth16 import Groth16
    profile_r1cs_system(Groth16, "alt_bn128", nc, ninp,
                        serialize_fns=_serialize)
