"""TinyRAM CPU-checker gadget: run every opcode through the executor and
assert each step's transition constraint system is satisfied (reference
gadgetlib1/gadgets/cpu_checkers/tinyram test pattern)."""
import pytest

from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariable
from libsnark_tpu.gadgets.tinyram_cpu_checker import TinyRAMCPUChecker
from libsnark_tpu.relations.tinyram import (
    TinyRAMParams, TinyRAMProgram, TinyRAMExecutor, Opcode)

P = int("21888242871839275222246405745257275088"
        "548364400416034343698204186575808495617")


def _check_trace(ap, prog, primary=(), aux=()):
    ex = TinyRAMExecutor(ap, prog)
    answer, accepted, trace = ex.run(list(primary), list(aux))
    for step in trace:
        pb = Protoboard(P)
        regs_b = [PBVariable().allocate(pb, f"rb{j}") for j in range(ap.k)]
        regs_a = [PBVariable().allocate(pb, f"ra{j}") for j in range(ap.k)]
        flag_b = PBVariable().allocate(pb, "fb")
        flag_a = PBVariable().allocate(pb, "fa")
        pc_b = PBVariable().allocate(pb, "pcb")
        pc_a = PBVariable().allocate(pb, "pca")
        instr = PBVariable().allocate(pb, "instr")
        mem_addr = PBVariable().allocate(pb, "maddr")
        mem_in = PBVariable().allocate(pb, "min")
        mem_out = PBVariable().allocate(pb, "mout")
        mem_st = PBVariable().allocate(pb, "mst")
        g = TinyRAMCPUChecker(pb, ap, regs_b, flag_b, pc_b,
                              regs_a, flag_a, pc_a, instr,
                              mem_addr, mem_in, mem_out, mem_st, "cpu")
        g.generate_r1cs_constraints()
        for j in range(ap.k):
            pb.setval(regs_b[j], step.regs_before[j])
        pb.setval(flag_b, 1 if step.flag_before else 0)
        pb.setval(pc_b, step.pc)
        pb.setval(instr, step.instruction.as_dword(ap))
        g.generate_r1cs_witness(step)
        bad = pb.first_unsatisfied()
        assert bad is None, (f"step {step.timestamp} "
                             f"({step.instruction.opcode.name}): {bad}")
    return answer, accepted


def test_cpu_checker_alu_ops():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 200)
    prog.add(Opcode.MOV, True, 1, 0, 77)
    prog.add(Opcode.ADD, False, 2, 0, 1)     # 200+77 = 277 -> 21, carry
    prog.add(Opcode.SUB, False, 2, 1, 0)     # 77-200 borrow
    prog.add(Opcode.AND, False, 3, 0, 1)
    prog.add(Opcode.OR, False, 3, 0, 1)
    prog.add(Opcode.XOR, False, 3, 0, 1)
    prog.add(Opcode.NOT, True, 3, 0, 0xF0F0)
    prog.add(Opcode.MULL, False, 2, 0, 1)
    prog.add(Opcode.UMULH, False, 2, 0, 1)
    prog.add(Opcode.SMULH, False, 2, 0, 1)
    prog.add(Opcode.UDIV, False, 2, 0, 1)
    prog.add(Opcode.UMOD, False, 2, 0, 1)
    prog.add(Opcode.UDIV, True, 2, 0, 0)     # div by zero
    prog.add(Opcode.SHL, True, 2, 0, 3)
    prog.add(Opcode.SHR, True, 2, 0, 2)
    prog.add(Opcode.SHL, True, 2, 0, 200)    # out-of-range shift
    prog.add(Opcode.ANSWER, True, 0, 0, 0)
    answer, accepted = _check_trace(ap, prog)
    assert accepted


def test_cpu_checker_compare_and_flow():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 5)
    prog.add(Opcode.MOV, True, 1, 0, 250)    # negative as signed
    prog.add(Opcode.CMPE, False, 0, 0, 1)
    prog.add(Opcode.CMPA, False, 0, 1, 0)    # 250 > 5 unsigned
    prog.add(Opcode.CMPAE, False, 0, 0, 1)
    prog.add(Opcode.CMPG, False, 0, 0, 1)    # 5 > -6 signed
    prog.add(Opcode.CMPGE, False, 0, 1, 0)   # -6 >= 5 ? no
    prog.add(Opcode.CMOV, True, 2, 0, 42)
    prog.add(Opcode.CJMP, True, 0, 0, 10)
    prog.add(Opcode.JMP, True, 0, 0, 10)
    prog.add(Opcode.ANSWER, True, 0, 0, 0)   # pc 10
    answer, accepted = _check_trace(ap, prog)
    assert accepted


def test_cpu_checker_memory_and_read():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.READ, True, 0, 0, 0)
    prog.add(Opcode.STOREW, True, 0, 0, 100)
    prog.add(Opcode.LOADW, True, 1, 0, 100)
    prog.add(Opcode.STOREB, True, 1, 0, 101)
    prog.add(Opcode.LOADB, True, 2, 0, 101)
    prog.add(Opcode.READ, True, 3, 0, 0)     # exhausted tape -> 0, flag
    prog.add(Opcode.ANSWER, True, 0, 0, 0)
    answer, accepted = _check_trace(ap, prog, primary=[33])
    assert accepted


def test_cpu_checker_rejects_tampered_byte_store():
    """A STOREB step whose next-dword clobbers more than the addressed
    byte must violate the masking constraints."""
    import dataclasses
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 0xABCD)
    prog.add(Opcode.STOREW, True, 0, 0, 100)
    prog.add(Opcode.MOV, True, 1, 0, 0x77)
    prog.add(Opcode.STOREB, True, 1, 0, 101)
    prog.add(Opcode.ANSWER, True, 0, 0, 0)
    ex = TinyRAMExecutor(ap, prog)
    answer, accepted, trace = ex.run([], [])
    step = next(s for s in trace
                if s.instruction.opcode == Opcode.STOREB)
    kind, addr, before, after = step.mem_op
    assert after == 0x77CD
    # tamper: pretend the store rewrote the whole dword
    bad = dataclasses.replace(step, mem_op=(kind, addr, before, 0x7777))
    pb = Protoboard(P)
    regs_b = [PBVariable().allocate(pb, f"rb{j}") for j in range(ap.k)]
    regs_a = [PBVariable().allocate(pb, f"ra{j}") for j in range(ap.k)]
    flag_b = PBVariable().allocate(pb, "fb")
    flag_a = PBVariable().allocate(pb, "fa")
    pc_b = PBVariable().allocate(pb, "pcb")
    pc_a = PBVariable().allocate(pb, "pca")
    instr = PBVariable().allocate(pb, "instr")
    mem_addr = PBVariable().allocate(pb, "maddr")
    mem_in = PBVariable().allocate(pb, "min")
    mem_out = PBVariable().allocate(pb, "mout")
    mem_st = PBVariable().allocate(pb, "mst")
    g = TinyRAMCPUChecker(pb, ap, regs_b, flag_b, pc_b,
                          regs_a, flag_a, pc_a, instr,
                          mem_addr, mem_in, mem_out, mem_st, "cpu")
    g.generate_r1cs_constraints()
    for j in range(ap.k):
        pb.setval(regs_b[j], bad.regs_before[j])
    pb.setval(flag_b, 1 if bad.flag_before else 0)
    pb.setval(pc_b, bad.pc)
    pb.setval(instr, bad.instruction.as_dword(ap))
    g.generate_r1cs_witness(bad)
    assert pb.first_unsatisfied() is not None
