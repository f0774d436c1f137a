"""RAM universal circuit: execute a TinyRAM program in-circuit with
memory consistency (reference: ram_to_r1cs + gen_ram_example tests)."""
import pytest

from libsnark_tpu.gadgets.ram_universal import ram_to_r1cs_instance_map
from libsnark_tpu.relations.tinyram import (
    TinyRAMParams, TinyRAMProgram, Opcode)

P = int("21888242871839275222246405745257275088"
        "548364400416034343698204186575808495617")


def _prove_program(prog, primary, aux, T, B=None):
    ap = TinyRAMParams(w=16, k=4)
    B = B or (prog.size + len(primary) + 1)
    pb, g = ram_to_r1cs_instance_map(P, ap, B, T)
    answer, accepted = g.generate_r1cs_witness(prog, primary, aux)
    return pb, g, answer, accepted


def test_ram_universal_arith_program():
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 9)
    prog.add(Opcode.ADD, True, 0, 0, 33)     # r0 = 42
    prog.add(Opcode.SUB, True, 0, 0, 42)     # r0 = 0
    prog.add(Opcode.ANSWER, False, 0, 0, 0)  # answer r0 = 0
    pb, g, answer, accepted = _prove_program(prog, [], [], T=5)
    assert accepted
    bad = pb.first_unsatisfied()
    assert bad is None, bad


def test_ram_universal_memory_program():
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 55)
    prog.add(Opcode.STOREW, True, 0, 0, 100)   # mem[100] = 55
    prog.add(Opcode.LOADW, True, 1, 0, 100)    # r1 = 55
    prog.add(Opcode.SUB, False, 2, 0, 1)       # r2 = 0
    prog.add(Opcode.ANSWER, False, 0, 0, 2)
    pb, g, answer, accepted = _prove_program(prog, [], [], T=6)
    assert accepted
    bad = pb.first_unsatisfied()
    assert bad is None, bad


def test_ram_universal_rejects_wrong_answer():
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 1)
    prog.add(Opcode.ANSWER, False, 0, 0, 0)   # answer r0 = 1 != 0
    pb, g, answer, accepted = _prove_program(prog, [], [], T=3)
    assert not accepted
    assert pb.first_unsatisfied() is not None


def test_ram_universal_tampered_memory_rejected():
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 55)
    prog.add(Opcode.STOREW, True, 0, 0, 100)
    prog.add(Opcode.LOADW, True, 1, 0, 100)
    prog.add(Opcode.SUB, False, 2, 0, 1)
    prog.add(Opcode.ANSWER, False, 0, 0, 2)
    pb, g, answer, accepted = _prove_program(prog, [], [], T=6)
    assert accepted and pb.first_unsatisfied() is None
    # tamper: change the loaded value (mem_out of the LOADW step)
    pb.setval(g.mem_out[2], 99)
    assert pb.first_unsatisfied() is not None


@pytest.mark.slow
def test_ram_ppzksnark_end_to_end(bn254):
    """Full RAM SNARK: generator -> prover -> verifier (reference
    run_ram_ppzksnark harness)."""
    from libsnark_tpu.proof_systems.ram_ppzksnark import RAMPpzksnark
    ap = TinyRAMParams(w=16, k=4)
    prog = TinyRAMProgram()
    prog.add(Opcode.MOV, True, 0, 0, 9)
    prog.add(Opcode.ADD, True, 0, 0, 33)
    prog.add(Opcode.SUB, True, 0, 0, 42)
    prog.add(Opcode.ANSWER, False, 0, 0, 0)
    rs = RAMPpzksnark(bn254)
    kp = rs.ram_generator(ap, boot_trace_size_bound=5, time_bound=5,
                          seed=123)
    proof, boot_input = rs.ram_prover(kp.pk, prog, [], [], seed=321)
    assert rs.ram_verifier(kp.vk, boot_input, proof)
    bad = [boot_input[0] + 1] + boot_input[1:]
    assert not rs.ram_verifier(kp.vk, bad, proof)
