"""RAM zkSNARK (delegated-memory TinyRAM + bounded PCD chain):
compliance predicate satisfiability, message chaining, transcript
verification (reference ram_zksnark tests / run_ram_zksnark harness)."""
import pytest

from libsnark_tpu.proof_systems.ram_zksnark import (
    RamZkSnark, RamZkSnarkArchParams, RamZkSnarkProof, statement_hash,
    make_delegated_memory)
from libsnark_tpu.relations.tinyram import (
    TinyRAMParams, TinyRAMProgram, Opcode, tinyram_boot_trace)


def _arch(depth=7):
    return RamZkSnarkArchParams(ap=TinyRAMParams(w=16, k=4),
                                tree_depth=depth)


def test_ram_compliance_predicate_memory_chain(bls377):
    """Store/load program: every step satisfiable, roots chain, final
    message accepts."""
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 55)
    prog.add(Opcode.STOREW, True, 0, 0, 100)   # mem[100] = 55
    prog.add(Opcode.LOADW, True, 1, 0, 100)    # r1 = 55
    prog.add(Opcode.SUB, False, 2, 0, 1)       # r2 = 0... (55-55)
    prog.add(Opcode.ANSWER, False, 0, 0, 2)
    arch = _arch()
    rs = RamZkSnark(bls377)
    T = 6
    pred, msgs, _ = rs.run_and_chain(arch, prog, [], [], T, check=True)
    assert len(msgs) == T + 1
    final = msgs[-1]
    assert final.has_accepted == 1
    assert final.timestamp == T
    # chaining: outgoing initials survive, roots evolve then settle
    assert final.root_initial == msgs[0].root
    assert msgs[2].root != msgs[0].root      # the STOREW moved the root
    # host verifier checks
    kp = rs.generator(arch, _keygen=False)
    assert rs.check_final_message(kp.vk, prog, [], T, msgs[0], final)
    assert not rs.check_final_message(kp.vk, prog, [], T + 1, msgs[0],
                                      final)

    # tamper: flip a loaded register in the last witnessed step
    pb = pred.pb
    pb.setval(pred.msg_out.regs[0], 1234)
    assert pb.first_unsatisfied() is not None


def test_ram_compliance_predicate_rejects_tampering(bls377):
    """A non-accepting run stays non-accepting; swapping the fetched
    instruction word or an authentication-path digest breaks the
    circuit."""
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 1)
    prog.add(Opcode.ANSWER, False, 0, 0, 0)    # answers r0=1: rejected
    arch = _arch()
    rs = RamZkSnark(bls377)
    pred, msgs, _ = rs.run_and_chain(arch, prog, [], [], 2, check=True)
    assert msgs[-1].has_accepted == 0          # honest run did not accept
    pb = pred.pb
    # forge the instruction word (now inconsistent with decode + fetch)
    forged = prog.instructions[1]
    import dataclasses
    forged = dataclasses.replace(forged, arg2idx_or_imm=0,
                                 arg2_is_imm=True)
    pb.setval(pred.instruction, forged.as_dword(arch.ap))
    pred.cpu.unpack_instr.generate_r1cs_witness_from_packed()
    assert pb.first_unsatisfied() is not None
    # restore, then corrupt one fetch-path sibling digest bit
    pb.setval(pred.instruction, prog.instructions[1].as_dword(arch.ap))
    pred.cpu.unpack_instr.generate_r1cs_witness_from_packed()
    assert pb.first_unsatisfied() is None
    b = pred.fetch_path.left_digests[0].bits[0]
    pb.setval(b, 1 - pb.val(b))
    assert pb.first_unsatisfied() is not None


def test_ram_zksnark_transcript_with_trapdoor_proofs(bls377):
    """End-to-end transcript verification with trapdoor-simulated inner
    Groth16 proofs (the device prover path is exercised by the Groth16
    suite; here the statement/chaining logic is under test)."""
    from test_verifier_gadget import _trapdoor_groth16

    prog = TinyRAMProgram()
    prog.add(Opcode.ANSWER, True, 0, 0, 0)     # immediately accept
    arch = _arch(depth=4)
    rs = RamZkSnark(bls377)
    T = 2
    pred, msgs, _ = rs.run_and_chain(arch, prog, [], [], T, check=True)
    assert msgs[-1].has_accepted == 1

    # capture per-step assignments by re-running the chain
    cs = pred.pb.get_constraint_system()
    boot = tinyram_boot_trace(arch.ap, prog, [])
    mem = make_delegated_memory(bls377.r, arch, boot)
    from libsnark_tpu.relations.tinyram import TinyRAMUnifiedExecutor
    import dataclasses
    ex = TinyRAMUnifiedExecutor(arch.ap, prog)
    _, _, trace = ex.run_from_boot(boot, [], [], max_steps=T)
    while len(trace) < T:
        last = trace[-1]
        trace.append(dataclasses.replace(
            last, timestamp=last.timestamp + 1, pc=last.pc_after,
            regs_before=list(last.regs_after),
            flag_before=last.flag_after, mem_op=None))
    cur = msgs[0]
    vk = None
    proofs = []
    for step in trace:
        cur = pred.witness_step(cur, step, mem)
        primary = pred.pb.primary_input()
        aux = pred.pb.auxiliary_input()
        vk, proof = _trapdoor_groth16(bls377, cs, primary, aux)
        proofs.append(proof)
    kp = rs.generator(arch, _keygen=False)
    kp.vk.inner_vk = vk
    zkp = RamZkSnarkProof(messages=[msgs[0], msgs[-1]],
                          inner_proofs=proofs)
    assert rs.verify_transcript(kp.vk, prog, [], T, zkp,
                                all_messages=msgs)

    # wrong chain: swap a middle message
    bad = list(msgs)
    bad[1] = dataclasses.replace(bad[1], pc_addr=(bad[1].pc_addr + 1))
    assert not rs.verify_transcript(kp.vk, prog, [], T, zkp,
                                    all_messages=bad)
    # wrong final claim
    bad2 = list(msgs)
    bad2[-1] = dataclasses.replace(bad2[-1], has_accepted=0)
    assert not rs.verify_transcript(kp.vk, prog, [], T, zkp,
                                    all_messages=bad2)


def test_statement_hash_matches_circuit(bls377):
    """The in-circuit [h_in, h_out] equals the host statement hashes."""
    prog = TinyRAMProgram()
    prog.add(Opcode.ANSWER, True, 0, 0, 0)
    arch = _arch(depth=4)
    rs = RamZkSnark(bls377)
    pred, msgs, _ = rs.run_and_chain(arch, prog, [], [], 1, check=True)
    assert pred.pb.primary_input() == statement_hash(
        bls377.r, arch, msgs[0], msgs[1])
