"""TinyRAM demo, step 2/3: read the proving key, run + prove a TinyRAM
program, write proof + boot input files.

usage: demo_ram_ppzksnark_prover.py <dir> [program.txt]
Program format: one instruction per line: OPCODE imm des arg1 arg2
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

from libsnark_tpu import get_curve
from libsnark_tpu.proof_systems.ram_ppzksnark import RAMPpzksnark
from libsnark_tpu.relations.tinyram import TinyRAMProgram, Opcode
from libsnark_tpu.serialization import Codec


def load_program(path):
    prog = TinyRAMProgram()
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if not line:
                continue
            op, imm, des, a1, a2 = line.split()
            prog.add(Opcode[op], imm in ("1", "true", "imm"),
                     int(des), int(a1), int(a2))
    return prog


DEFAULT_PROGRAM = """\
MOV 1 0 0 7
STOREW 1 0 0 64
LOADW 1 1 0 64
ANSWER 1 0 0 0
"""

if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ram_demo"
    if len(sys.argv) > 2:
        prog = load_program(sys.argv[2])
    else:
        path = os.path.join(d, "program.txt")
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(DEFAULT_PROGRAM)
        prog = load_program(path)
    curve = get_curve("alt_bn128")
    ps = RAMPpzksnark(curve)
    with open(os.path.join(d, "pk.pickle"), "rb") as f:
        pk = pickle.load(f)
    proof, boot_primary = ps.ram_prover(pk, prog, [], [], seed=2)
    codec = Codec(curve)
    with open(os.path.join(d, "proof.txt"), "wb") as f:
        codec.write_bctv14_proof(f, proof)
    with open(os.path.join(d, "boot_input.txt"), "wb") as f:
        codec.write_fr_vector(f, boot_primary)
    print(f"wrote {d}/proof.txt and {d}/boot_input.txt")
