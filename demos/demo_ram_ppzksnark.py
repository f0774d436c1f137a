"""Combined TinyRAM ppzkSNARK demo (reference zk_proof_systems/
ppzksnark/ram_ppzksnark/examples/demo_ram_ppzksnark.cpp,
CMakeLists.txt:112): one process doing generator -> prover -> verifier
on a program/bounds/tapes loaded from files (same file contract as
demo_arithmetization; the three split demos demo_ram_ppzksnark_
{generator,prover,verifier}.py are the serialized-key variants).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

from libsnark_tpu import get_curve
from libsnark_tpu.proof_systems.ram_ppzksnark import RAMPpzksnark
from libsnark_tpu.relations.tinyram import (
    TinyRAMParams, load_preprocessed_program)
from libsnark_tpu.profiling import enter_block, start_profiling


def _read_tape(path):
    toks = open(path).read().split()
    n = int(toks[0])
    return [int(t) for t in toks[1:1 + n]]


def main():
    ap_ = argparse.ArgumentParser()
    for name in ("assembly", "processed_assembly", "architecture_params",
                 "computation_bounds", "primary_input", "auxiliary_input"):
        ap_.add_argument("--" + name, required=True)
    args = ap_.parse_args()
    start_profiling()

    w, k = (int(t) for t in open(args.architecture_params).read().split()[:2])
    ap = TinyRAMParams(w=w, k=k)
    bounds = open(args.computation_bounds).read().split()
    input_size_bound, program_size_bound, time_bound = (
        int(bounds[0]), int(bounds[1]), int(bounds[2]))
    with open(args.processed_assembly) as f:
        program = load_preprocessed_program(ap, f)
    primary = _read_tape(args.primary_input)
    auxiliary = _read_tape(args.auxiliary_input)

    curve = get_curve("alt_bn128")
    ps = RAMPpzksnark(curve)
    boot_bound = program_size_bound + input_size_bound

    with enter_block("RAM ppzkSNARK generator"):
        kp = ps.ram_generator(ap, boot_bound, time_bound)

    with enter_block("RAM ppzkSNARK prover"):
        proof, boot_primary = ps.ram_prover(kp.pk, program, primary, auxiliary)

    with enter_block("RAM ppzkSNARK verifier"):
        ok = ps.ram_verifier(kp.vk, boot_primary, proof)
    print(f"* The verification result is: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
