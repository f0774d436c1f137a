"""TinyRAM ISA + executor + memory interface tests (reference
relations/ram_computations tests / gen_ram_example pattern)."""
from libsnark_tpu.relations.tinyram import (
    TinyRAMParams, TinyRAMProgram, TinyRAMInstruction, TinyRAMExecutor,
    Opcode, DEFAULT_INSTRUCTION, tinyram_boot_trace)
from libsnark_tpu.relations.memory import (
    RAMemory, MemoryStoreTrace, DelegatedRAMemory)
from libsnark_tpu.relations.fooram import FooRAMParams, FooRAMExecutor


def test_instruction_encoding_roundtrip():
    ap = TinyRAMParams(w=16, k=16)
    for ins in [TinyRAMInstruction(Opcode.ADD, True, 3, 5, 1234),
                TinyRAMInstruction(Opcode.LOADW, False, 7, 0, 9),
                DEFAULT_INSTRUCTION]:
        dw = ins.as_dword(ap)
        assert dw < (1 << (2 * ap.w))
        dec = TinyRAMInstruction.from_dword(ap, dw)
        assert dec == ins


def test_executor_arithmetic_and_answer():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 7)        # r0 = 7
    prog.add(Opcode.MOV, True, 1, 0, 5)        # r1 = 5
    prog.add(Opcode.ADD, False, 2, 0, 1)       # r2 = r0 + r1 = 12
    prog.add(Opcode.MULL, True, 2, 2, 3)       # r2 = 36
    prog.add(Opcode.SUB, True, 2, 2, 36)       # r2 = 0
    prog.add(Opcode.ANSWER, False, 0, 0, 2)    # answer r2
    ex = TinyRAMExecutor(ap, prog)
    answer, accepted, trace = ex.run([], [])
    assert answer == 0 and accepted
    assert trace[-1].instruction.opcode == Opcode.ANSWER


def test_executor_memory_and_tape():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.READ, True, 0, 0, 0)       # r0 = tape[0] = 21
    prog.add(Opcode.STOREW, True, 0, 0, 64)    # mem[64] = r0
    prog.add(Opcode.LOADW, True, 1, 0, 64)     # r1 = mem[64]
    prog.add(Opcode.SUB, False, 2, 0, 1)       # r2 = 0
    prog.add(Opcode.ANSWER, False, 0, 0, 2)
    ex = TinyRAMExecutor(ap, prog)
    answer, accepted, trace = ex.run([21], [])
    assert accepted
    # byte address 64 -> dword cell 16 (subaddr_len=2), lower word
    mem_ops = [s.mem_op for s in trace if s.mem_op]
    assert mem_ops == [("w", 16, 0, 21), ("r", 16, 21, 21)]


def test_executor_byte_semantics():
    """STOREB/LOADB act on single bytes of a dword cell (ISA parity;
    reference tinyram_cpu_checker.tcc:398-434 memory model)."""
    ap = TinyRAMParams(w=16, k=8)
    sal = ap.subaddr_len
    assert sal == 2                            # 4 bytes per dword
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 0xABCD)
    prog.add(Opcode.STOREW, True, 0, 0, 100)   # dword 25, word 0
    prog.add(Opcode.MOV, True, 1, 0, 0x7777)
    prog.add(Opcode.STOREB, True, 1, 0, 101)   # byte 1 of dword 25
    prog.add(Opcode.LOADW, True, 2, 0, 100)    # word 0 back
    prog.add(Opcode.LOADB, True, 3, 0, 100)    # byte 0
    prog.add(Opcode.LOADB, True, 4, 0, 101)    # byte 1 (overwritten)
    prog.add(Opcode.STOREW, True, 0, 0, 102)   # word 1 of the same dword
    prog.add(Opcode.LOADB, True, 5, 0, 103)    # byte 3
    prog.add(Opcode.ANSWER, True, 0, 0, 0)
    ex = TinyRAMExecutor(ap, prog)
    answer, accepted, trace = ex.run([], [])
    assert accepted
    final_regs = trace[-1].regs_before
    assert final_regs[2] == 0x77CD             # byte 1 replaced by 0x77
    assert final_regs[3] == 0xCD               # low byte of stored word
    assert final_regs[4] == 0x77               # the STOREB byte
    assert final_regs[5] == 0xAB               # high byte of word 1


def test_executor_control_flow():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    # loop: r0 goes 5 -> 0 by decrement
    prog.add(Opcode.MOV, True, 0, 0, 5)
    prog.add(Opcode.SUB, True, 0, 0, 1)        # pc=1
    prog.add(Opcode.CMPE, True, 0, 0, 0)       # flag = (r0 == 0)
    prog.add(Opcode.CNJMP, True, 0, 0, 1)      # loop while r0 != 0
    prog.add(Opcode.ANSWER, False, 0, 0, 0)    # answer r0 = 0
    ex = TinyRAMExecutor(ap, prog)
    answer, accepted, trace = ex.run([], [])
    assert accepted
    # 1 mov + 5*(sub,cmpe,cnjmp) + answer
    assert len(trace) == 1 + 15 + 1


def test_boot_trace_layout():
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.ANSWER, True, 0, 0, 0)
    contents = tinyram_boot_trace(ap, prog, [42, 43])
    assert contents[0] == prog.instructions[0].as_dword(ap)
    assert contents[1] == 42 and contents[2] == 43


def test_memory_interfaces():
    m = RAMemory(256, 16, {3: 99})
    assert m.get_value(3) == 99 and m.get_value(5) == 0
    m.set_value(5, 7)
    assert m.get_value(5) == 7

    t = MemoryStoreTrace()
    t.set_trace_entry(1, (10, 100))
    t.set_trace_entry(2, (20, 200))
    assert t.get_trace_entry(1) == (10, 100)
    assert t.as_memory_contents() == {10: 100, 20: 200}


def test_delegated_memory_root_changes():
    from libsnark_tpu.gadgets.hashes.sha256_host import (
        sha256_two_to_one_hash_bits)
    m = DelegatedRAMemory(8, 16, sha256_two_to_one_hash_bits, {0: 5})
    r1 = m.get_root()
    m.set_value(3, 77)
    r2 = m.get_root()
    assert r1 != r2
    assert m.get_value(3) == 77
    assert len(m.get_path(3)) == 3


def test_fooram():
    ap = FooRAMParams(w=8)
    ex = FooRAMExecutor(ap, {0: 3, 3: 5, 8: 2})
    acc, trace = ex.run(3)
    # acc: 0+3=3 -> pc 3; 3+5=8 -> pc 8; 8+2=10
    assert acc == 10 and len(trace) == 3


def test_fooram_cpu_checker_gadget():
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariable
    from libsnark_tpu.gadgets.fooram_checker import FooRAMCPUChecker
    P = int("21888242871839275222246405745257275088"
            "548364400416034343698204186575808495617")
    ap = FooRAMParams(w=8)
    ex = FooRAMExecutor(ap, {0: 3, 3: 250, 8: 2})
    acc, trace = ex.run(2)
    state_acc, state_pc = 0, 0
    for ts, pc_after, acc_after, v in trace:
        pb = Protoboard(P)
        a0 = PBVariable().allocate(pb, "a0")
        p0 = PBVariable().allocate(pb, "p0")
        mv = PBVariable().allocate(pb, "mv")
        a1 = PBVariable().allocate(pb, "a1")
        p1 = PBVariable().allocate(pb, "p1")
        g = FooRAMCPUChecker(pb, 8, a0, p0, mv, a1, p1)
        g.generate_r1cs_constraints()
        pb.setval(a0, state_acc)
        pb.setval(p0, state_pc)
        pb.setval(mv, v)
        g.generate_r1cs_witness()
        assert pb.val(a1) == acc_after and pb.val(p1) == pc_after
        assert pb.is_satisfied()
        state_acc, state_pc = acc_after, pc_after


def test_gen_ram_example_simple():
    """Reference gen_ram_example_simple parity (ram_examples.tcc:24):
    sampled example accepts iff satisfiable."""
    from libsnark_tpu.relations.examples import gen_ram_example_simple
    from libsnark_tpu.relations.tinyram import (
        TinyRAMParams, TinyRAMUnifiedExecutor, tinyram_boot_trace)
    ap = TinyRAMParams(w=16, k=4)
    for sat in (True, False):
        prog, primary, aux, T = gen_ram_example_simple(ap, 16, 8, sat, seed=3)
        assert prog.size == 8 and len(primary) == 8
        ex = TinyRAMUnifiedExecutor(ap, prog)
        boot = tinyram_boot_trace(ap, prog, primary)
        answer, accepted, _ = ex.run_from_boot(boot, primary, aux, T)
        assert accepted == sat


def test_gen_ram_example_complex():
    """Reference gen_ram_example_complex parity (ram_examples.tcc:77):
    byte-addressed memory round trip; acceptance controlled by the
    first input word."""
    from libsnark_tpu.relations.examples import gen_ram_example_complex
    from libsnark_tpu.relations.tinyram import (
        TinyRAMParams, TinyRAMUnifiedExecutor, tinyram_boot_trace)
    ap = TinyRAMParams(w=16, k=4)
    for sat in (True, False):
        prog, primary, aux, T = gen_ram_example_complex(ap, 16, 8, sat, seed=5)
        ex = TinyRAMUnifiedExecutor(ap, prog)
        boot = tinyram_boot_trace(ap, prog, primary)
        answer, accepted, _ = ex.run_from_boot(boot, primary, aux, T)
        assert accepted == sat


def test_gen_ram_example_complex_in_circuit():
    """The complex example proves in the universal circuit."""
    from libsnark_tpu.relations.examples import gen_ram_example_complex
    from libsnark_tpu.relations.tinyram import TinyRAMParams
    from libsnark_tpu.gadgets.ram_universal import ram_to_r1cs_instance_map
    P = int("21888242871839275222246405745257275088"
            "548364400416034343698204186575808495617")
    ap = TinyRAMParams(w=16, k=4)
    B, T = 12, 6
    prog, primary, aux, _ = gen_ram_example_complex(ap, B, T, True, seed=9)
    pb, g = ram_to_r1cs_instance_map(P, ap, B, T)
    answer, accepted = g.generate_r1cs_witness(prog, primary, aux)
    assert accepted
    assert pb.first_unsatisfied() is None
