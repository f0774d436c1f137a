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


# --------------------------------------------------------------------------
# unbounded recursion backend (MNT-cycle PCD) -- ram_zksnark.tcc:142
# --------------------------------------------------------------------------

def _mnt4():
    from libsnark_tpu.curves import get_curve
    return get_curve("mnt4")


def test_ram_cycle_predicate_chain():
    """The cp_handler-form RAM predicate: a full program chain is
    satisfiable step by step, payload encode/decode round-trips, and a
    type-0 (base) claim with nonzero timestamp is rejected."""
    from libsnark_tpu.proof_systems.ram_zksnark import (
        RamZkSnarkCycle, RamCycleCompliancePredicate, ram_cycle_payload,
        payload_to_ram_msg)
    from libsnark_tpu.proof_systems.compliance_predicate import PCDLocalData

    p = _mnt4().r
    arch = _arch()
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 55)
    prog.add(Opcode.STOREW, True, 0, 0, 100)
    prog.add(Opcode.LOADW, True, 1, 0, 100)
    prog.add(Opcode.SUB, False, 2, 0, 1)
    prog.add(Opcode.ANSWER, False, 0, 0, 2)

    rsc = RamZkSnarkCycle.__new__(RamZkSnarkCycle)
    rsc.pcd, rsc.p = None, p
    T = 6
    mem, trace = RamZkSnarkCycle._trace(rsc, arch, prog, [], [], T)
    from libsnark_tpu.proof_systems.ram_zksnark import RamPCDMessage
    msg = RamPCDMessage.initial(arch, mem.get_root())
    cur = None
    for i, step in enumerate(trace):
        h = RamCycleCompliancePredicate(p, arch)
        h.generate_r1cs_constraints()
        h.set_step_context(msg, step, mem)
        out = h.generate_r1cs_witness([] if cur is None else [cur],
                                      PCDLocalData(values=[]))
        assert h.pb.first_unsatisfied() is None, f"step {i}"
        assert payload_to_ram_msg(p.bit_length(), arch,
                                  out.payload) == h.last_msg_out
        msg, cur = h.last_msg_out, out
    assert msg.has_accepted == 1 and msg.timestamp == T

    # adversarial: claim base (type 0) for a mid-chain state
    h3 = RamCycleCompliancePredicate(p, arch)
    h3.generate_r1cs_constraints()
    mem3, trace3 = RamZkSnarkCycle._trace(rsc, arch, prog, [], [], T)
    h3.set_step_context(RamPCDMessage.initial(arch, mem3.get_root()),
                        trace3[0], mem3)
    h3.generate_r1cs_witness([], PCDLocalData(values=[]))
    h3.pb.setval(h3.msg_in.ts, 5)
    assert h3.pb.first_unsatisfied() is not None


@pytest.mark.slow
def test_ram_cycle_compliance_splice_with_trapdoor_translation():
    """RAM predicate spliced into the cycle compliance circuit
    (base_case='type0'): base + successor steps satisfiable with a
    trapdoor translation proof; hash chain matches the host
    message_hash; a wrong-statement proof is rejected."""
    from libsnark_tpu.proof_systems.pcd_cycle import CycleSpPCD
    from libsnark_tpu.proof_systems.ram_zksnark import (
        RamZkSnarkCycle, RamPCDMessage, payload_to_ram_msg)
    from libsnark_tpu.proof_systems.compliance_predicate import (
        PCDLocalData, PCDMessage)
    from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
    from libsnark_tpu.relations.variable import Variable
    from test_verifier_gadget import _trapdoor_groth16

    pcd = CycleSpPCD()
    A, B = pcd.A, pcd.B

    def _dummy_vk(curve, statement, seed=7):
        cs = R1CSConstraintSystem(curve.r, 1, 1)
        w = Variable(2)
        cs.add_constraint(w * 1, w * 1, w * 1, "w_bool")
        return _trapdoor_groth16(curve, cs, [statement % curve.r], [0],
                                 seed=seed)

    vk_b, _ = _dummy_vk(B, 123)
    arch = RamZkSnarkArchParams(ap=TinyRAMParams(w=16, k=2), tree_depth=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 7)
    prog.add(Opcode.STOREW, True, 0, 0, 5)
    prog.add(Opcode.ANSWER, True, 0, 0, 0)

    rsc = RamZkSnarkCycle(pcd)
    handler0 = rsc.predicate(arch)
    handler_cs = handler0.get_constraint_system()
    msg_size = len(handler0.outgoing)

    T = 2
    mem, trace = rsc._trace(arch, prog, [], [], T)
    msg = RamPCDMessage.initial(arch, mem.get_root())
    cur_msg, h_prev = None, None
    for i, step in enumerate(trace):
        h = rsc.predicate(arch)
        h.set_step_context(msg, step, mem)
        proofs = []
        if cur_msg is not None:
            _, pi = _dummy_vk(B, h_prev)
            proofs = [pi]
        Ci = pcd.build_compliance_circuit(handler_cs, 1, msg_size,
                                          base_case="type0")
        pcd.witness_compliance(Ci, h, vk_b,
                               [] if cur_msg is None else [cur_msg],
                               proofs, PCDLocalData(values=[]))
        assert Ci["pb"].first_unsatisfied() is None, f"step {i}"
        out_msg = PCDMessage(
            type=Ci["pb"].val(Ci["out_block"][0]),
            payload=[Ci["pb"].val(v) for v in Ci["out_block"][1:]])
        h_prev = Ci["pb"].primary_input()[0]
        assert h_prev == pcd.message_hash(vk_b, out_msg)
        msg, cur_msg = h.last_msg_out, out_msg

    final = payload_to_ram_msg(A.r.bit_length(), arch, cur_msg.payload)
    assert final.timestamp == T and final.has_accepted == 1

    # wrong-statement translation proof must break the compliance step
    _, pi_bad = _dummy_vk(B, h_prev + 1)
    h2 = rsc.predicate(arch)
    h2.set_step_context(msg, trace[-1], mem)
    Cb = pcd.build_compliance_circuit(handler_cs, 1, msg_size,
                                      base_case="type0")
    pcd.witness_compliance(Cb, h2, vk_b, [cur_msg], [pi_bad],
                           PCDLocalData(values=[]))
    assert Cb["pb"].first_unsatisfied() is not None
