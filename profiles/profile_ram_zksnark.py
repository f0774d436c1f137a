"""ram_zksnark profiling harness (reference
zk_proof_systems/zksnark/ram_zksnark/profiling/profile_ram_zksnark.cpp):
delegated-memory TinyRAM proving, timed per phase.

Backends (--backend=X):
  transcript  per-step inner proofs, chained statement hashes (default;
              device proves over BLS12-377)
  succinct    + ONE outer aggregation proof over BW6-761
  cycle       TRUE unbounded MNT-cycle PCD (RamZkSnarkCycle; heavy --
              compliance circuit is ~131k constraints per step)

usage: profile_ram_zksnark.py [w] [k] [time_bound] [--backend=X]
"""
import sys

from _common import init_backend, Timed

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    backend = "transcript"
    for a in sys.argv[1:]:
        if a.startswith("--backend="):
            backend = a.split("=", 1)[1]
    assert backend in ("transcript", "succinct", "cycle")
    w = int(args[0]) if len(args) > 0 else 16
    kregs = int(args[1]) if len(args) > 1 else 4
    T = int(args[2]) if len(args) > 2 else 3
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.relations.tinyram import (TinyRAMParams,
                                                TinyRAMProgram, Opcode)
    from libsnark_tpu.proof_systems.ram_zksnark import (
        RamZkSnark, RamZkSnarkCycle, RamZkSnarkArchParams)

    ap = TinyRAMParams(w=w, k=kregs)
    arch = RamZkSnarkArchParams(ap=ap, tree_depth=min(8, w))
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 7)
    prog.add(Opcode.STOREW, True, 0, 0, 5)
    prog.add(Opcode.ANSWER, True, 0, 0, 0)

    if backend == "cycle":
        rs = RamZkSnarkCycle()
        with Timed("Generator (cycle keys; compliance+translation)"):
            kp = rs.generator(arch, seed=1)
        with Timed(f"Prover ({T} PCD steps)"):
            proof = rs.prover(kp, prog, [], T, [], seed=2)
        with Timed("Verifier (host checks + ONE pairing check)"):
            ok = rs.verifier(kp.pcd_vk, arch, prog, [], T, proof)
    elif backend == "succinct":
        bls = get_curve("bls12_377")
        bw6 = get_curve("bw6_761")
        rs = RamZkSnark(bls)
        with Timed("Generator (inner + outer aggregation keys)"):
            skp = rs.generator_succinct(arch, bw6, T, seed=1)
        with Timed(f"Prover ({T} inner proves + outer prove)"):
            proof = rs.prover_succinct(skp, prog, [], T, [], seed=2)
        with Timed("Verifier"):
            ok = rs.verifier_succinct(skp.outer_keypair.vk, arch, bw6,
                                      prog, [], T, proof)
    else:
        bls = get_curve("bls12_377")
        rs = RamZkSnark(bls)
        with Timed("Generator (inner step keys)"):
            kp = rs.generator(arch, seed=1)
        with Timed("Message chain (execute + witness)"):
            _, msgs, _ = rs.run_and_chain(arch, prog, [], [], T)
        with Timed(f"Prover ({T} inner proves)"):
            proof = rs.prover(kp.pk, prog, [], T, [], seed=2)
        with Timed("Verifier (endpoint checks + per-step pairings)"):
            ok = rs.verify_transcript(kp.vk, prog, [], T, proof,
                                      all_messages=msgs)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
