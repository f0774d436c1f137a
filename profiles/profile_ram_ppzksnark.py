"""RAM ppzkSNARK profiling harness (reference
profile_ram_ppzksnark.cpp): universal TinyRAM circuit at a given time
bound, gen/prove/verify with timers.

usage: profile_ram_ppzksnark.py [time_bound] [boot_bound]
"""
import sys
from _common import init_backend, Timed

if __name__ == "__main__":
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.proof_systems.ram_ppzksnark import RAMPpzksnark
    from libsnark_tpu.relations.tinyram import (
        TinyRAMParams, TinyRAMProgram, Opcode)

    curve = get_curve("alt_bn128")
    ap = TinyRAMParams(w=16, k=4)
    # simple accept program: store/load a word then ANSWER 0
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 7)
    prog.add(Opcode.STOREW, True, 0, 0, 64)
    prog.add(Opcode.LOADW, True, 1, 0, 64)
    prog.add(Opcode.ANSWER, True, 0, 0, 0)

    ps = RAMPpzksnark(curve)
    with Timed("Generator (universal circuit)"):
        kp = ps.ram_generator(ap, B, T, seed=1)
    with Timed("Prover"):
        proof, boot_primary = ps.ram_prover(kp.pk, prog, [], [], seed=2)
    with Timed("Verifier"):
        ok = ps.ram_verifier(kp.vk, boot_primary, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
