"""GM17 (SE) profiling harness (reference profile_r1cs_se_ppzksnark.cpp).

usage: profile_r1cs_se_ppzksnark.py <num_constraints> <input_size> [Fr|bytes]
"""
from _common import parse_std_args, profile_r1cs_system

if __name__ == "__main__":
    nc, ninp = parse_std_args()
    from libsnark_tpu.proof_systems.gm17 import GM17
    profile_r1cs_system(GM17, "alt_bn128", nc, ninp)
