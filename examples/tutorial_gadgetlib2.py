"""gadgetlib2 tutorial (reference gadgetlib2/examples/tutorial.cpp,
read top-down): protoboard usage, writing a gadget, composing gadgets,
and the integration path gadgetlib2 circuit -> R1CS -> ppzkSNARK.

Run: python examples/tutorial_gadgetlib2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

from libsnark_tpu import get_curve
from libsnark_tpu.gadgetlib2 import (
    GL2Protoboard, GL2Variable, GL2VariableArray, GL2Gadget, ANDGadget,
    get_constraint_system_from_gadgetlib2,
    get_variable_assignment_from_gadgetlib2)

P = get_curve("alt_bn128").r


def example_protoboard_usage():
    """tutorial.cpp TEST(Examples, ProtoboardUsage): raw constraints."""
    pb = GL2Protoboard.create(P)
    inp = GL2VariableArray(3, "input")
    output = GL2Variable("output")
    # Constraint 1: input[0] * (5 + input[2]) == output
    pb.add_rank1_constraint(inp[0], 5 + inp[2], output, "c1")
    # Constraint 2 (unary form): input[1] - output == 0
    pb.add_rank1_constraint(1, inp[1] - output, 0, "c2")

    for v in list(inp) + [output]:
        pb.setval(v, 42)
    assert not pb.is_satisfied()

    pb.setval(inp[0], 1)
    pb.setval(inp[1], 42)
    pb.setval(output, 42)
    pb.setval(inp[2], 37)          # 1 * (5 + 37) == 42
    assert pb.is_satisfied()
    print("protoboard usage: OK")


class NANDGadget(GL2Gadget):
    """tutorial.cpp NAND_Gadget: composes ANDGadget + one negation
    constraint -- the canonical 'gadget using a sub-gadget' example."""

    def __init__(self, pb, inputs, output):
        super().__init__(pb)
        self.inputs = inputs
        self.output = output
        self.and_result = GL2Variable("and_result")
        self.and_gadget = ANDGadget(pb, inputs, self.and_result)

    def generateConstraints(self):
        self.and_gadget.generateConstraints()
        # output == 1 - and_result
        self.pb.add_rank1_constraint(
            1, 1 - self.and_result, self.output, "not")

    def generateWitness(self):
        self.and_gadget.generateWitness()
        self.pb.setval(self.output,
                       (1 - self.pb.val(self.and_result)) % self.pb.p)


def example_nand_gadget():
    pb = GL2Protoboard.create(P)
    inputs = GL2VariableArray(4, "inputs")
    output = GL2Variable("output")
    g = NANDGadget(pb, list(inputs), output)
    g.generateConstraints()
    for v in inputs:
        pb.setval(v, 1)
    g.generateWitness()
    assert pb.val(output) == 0 and pb.is_satisfied()
    pb.setval(inputs[2], 0)
    g.generateWitness()
    assert pb.val(output) == 1 and pb.is_satisfied()
    # tampering with the witness must break satisfiability
    pb.setval(output, 0)
    assert not pb.is_satisfied()
    print("NAND gadget: OK")


def example_integration_to_snark():
    """tutorial.cpp's final stage (simple_example.hpp +
    run_r1cs_ppzksnark): gadgetlib2 circuit -> R1CS -> prove/verify.
    The SNARK step runs the host-side checks here (the device prover is
    exercised by the test suite / profile harnesses)."""
    pb = GL2Protoboard.create(P)
    inputs = GL2VariableArray(2, "in")
    output = GL2Variable("out")
    pb.set_public(list(inputs) + [output])
    g = NANDGadget(pb, list(inputs), output)
    g.generateConstraints()
    pb.setval(inputs[0], 1)
    pb.setval(inputs[1], 0)
    g.generateWitness()
    assert pb.is_satisfied()

    cs, ordered = get_constraint_system_from_gadgetlib2(pb)
    full = get_variable_assignment_from_gadgetlib2(pb, ordered)
    k = cs.primary_input_size
    primary, aux = full[:k], full[k:]
    assert cs.is_satisfied(primary, aux)
    print(f"integration: R1CS with {cs.num_constraints} constraints, "
          f"{cs.num_variables} variables; satisfied = True")


if __name__ == "__main__":
    example_protoboard_usage()
    example_nand_gadget()
    example_integration_to_snark()
    print("tutorial complete")
