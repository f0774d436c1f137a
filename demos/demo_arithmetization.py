"""TinyRAM arithmetization demo (reference reductions/ram_to_r1cs/
examples/demo_arithmetization.cpp, CMakeLists.txt:111): load a
preprocessed TinyRAM program + architecture params + computation bounds
+ input tapes from files, build the universal circuit (ram->r1cs
instance map), execute + route the program (auxiliary input map) and
report whether the resulting R1CS is satisfied.

usage: demo_arithmetization.py --assembly f.s --processed_assembly f.txt
         --architecture_params ap.txt --computation_bounds cb.txt
         --primary_input pi.txt --auxiliary_input ai.txt
File formats (reference operator>> contracts):
  architecture_params: "<w> <k>"
  computation_bounds:  "<input_size_bound> <program_size_bound> <time_bound>"
  processed_assembly:  records "opcode immflag des arg1 arg2"
  primary/auxiliary_input: "<n> <word>*n"
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

from libsnark_tpu.relations.tinyram import (
    TinyRAMParams, load_preprocessed_program)
from libsnark_tpu.gadgets.ram_universal import ram_to_r1cs_instance_map
from libsnark_tpu import get_curve
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
    print("=" * 79)
    print("TinyRAM example loader")
    print("=" * 79 + "\n")

    w, k = (int(t) for t in open(args.architecture_params).read().split()[:2])
    ap = TinyRAMParams(w=w, k=k)
    print(f"Will run on {k} register machine (word size = {w})")

    bounds = open(args.computation_bounds).read().split()
    input_size_bound, program_size_bound, time_bound = (
        int(bounds[0]), int(bounds[1]), int(bounds[2]))
    with open(args.processed_assembly) as f:
        program = load_preprocessed_program(ap, f)
    print(f"Program: {program.size} instructions "
          f"(raw assembly at {args.assembly})")
    primary = _read_tape(args.primary_input)
    auxiliary = _read_tape(args.auxiliary_input)

    boot_trace_size_bound = program_size_bound + input_size_bound
    curve = get_curve("alt_bn128")

    with enter_block("Build universal circuit (ram_to_r1cs instance map)"):
        pb, g = ram_to_r1cs_instance_map(curve.r, ap, boot_trace_size_bound,
                                         time_bound)
    print(f"universal R1CS: {pb.num_constraints} constraints, "
          f"{pb.num_variables} variables")

    with enter_block("Execute program (auxiliary input map)"):
        answer, accepted = g.generate_r1cs_witness(program, primary, auxiliary)
    print(f"program answer = {answer}, accepted = {accepted}")

    ok = pb.is_satisfied()
    print(f"R1CS satisfied: {ok}")
    return 0 if (ok and accepted) else 1


if __name__ == "__main__":
    sys.exit(main())
