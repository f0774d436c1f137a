"""BCTV14 profiling harness (reference profile_r1cs_ppzksnark.cpp).

usage: profile_r1cs_ppzksnark.py <num_constraints> <input_size> [Fr|bytes]
"""
from _common import parse_std_args, profile_r1cs_system

if __name__ == "__main__":
    nc, ninp = parse_std_args()
    from libsnark_tpu.proof_systems.bctv14 import BCTV14
    profile_r1cs_system(BCTV14, "alt_bn128", nc, ninp)
