"""gadgetlib2 DSL + adapter tests (reference gadgetlib2/tests/*_UTEST +
the integration test that pushes a gadgetlib2 circuit through a real
SNARK, libsnark/CMakeLists.txt:165-175)."""
import pytest

from libsnark_tpu.gadgetlib2 import (
    GL2Protoboard, GL2Variable, GL2VariableArray, ANDGadget, ORGadget,
    InnerProductGadget, CompressionPackingGadget, LooseMUXGadget,
    get_constraint_system_from_gadgetlib2,
    get_variable_assignment_from_gadgetlib2)

P = int("21888242871839275222246405745257275088"
        "548364400416034343698204186575808495617")


def test_and_or_gadgets():
    pb = GL2Protoboard.create(P)
    xs = GL2VariableArray(3, "x")
    out_and, out_or = GL2Variable("and"), GL2Variable("or")
    g1 = ANDGadget(pb, xs, out_and)
    g2 = ORGadget(pb, xs, out_or)
    g1.generateConstraints()
    g2.generateConstraints()
    for vals, ea, eo in [((1, 1, 1), 1, 1), ((1, 0, 1), 0, 1),
                         ((0, 0, 0), 0, 0)]:
        for v, x in zip(xs, vals):
            pb.setval(v, x)
        g1.generateWitness()
        g2.generateWitness()
        assert pb.val(out_and) == ea and pb.val(out_or) == eo
        assert pb.is_satisfied()


def test_packing_and_mux():
    pb = GL2Protoboard.create(P)
    bits = GL2VariableArray(8, "b")
    packed = GL2Variable("packed")
    g = CompressionPackingGadget(pb, bits, packed)
    g.generateConstraints()
    pb.setval(packed, 0xB7)
    g.generateWitnessFromPacked()
    assert pb.is_satisfied()

    arr = GL2VariableArray(4, "arr")
    idx, res, ok = (GL2Variable("i"), GL2Variable("r"), GL2Variable("ok"))
    mux = LooseMUXGadget(pb, arr, idx, res, ok)
    mux.generateConstraints()
    for i, v in enumerate([10, 20, 30, 40]):
        pb.setval(arr[i], v)
    pb.setval(idx, 2)
    mux.generateWitness()
    assert pb.val(res) == 30 and pb.val(ok) == 1
    assert pb.is_satisfied()


def test_adapter_to_core_r1cs_and_snark(bn254):
    """Author in gadgetlib2, convert, prove with Groth16."""
    pb = GL2Protoboard.create(bn254.r)
    x = GL2Variable("x")
    y = GL2Variable("y")
    x2 = GL2Variable("x2")
    pb.set_public([x])
    pb.add_rank1_constraint(x, x, x2, "x*x")
    pb.add_rank1_constraint(x2, x, y, "x2*x")   # y = x^3
    pb.setval(x, 4)
    pb.setval(x2, 16)
    pb.setval(y, 64)
    assert pb.is_satisfied()
    cs, ordered = get_constraint_system_from_gadgetlib2(pb)
    full = get_variable_assignment_from_gadgetlib2(pb, ordered)
    primary, aux = full[:1], full[1:]
    assert cs.is_satisfied(primary, aux)

    from libsnark_tpu.proof_systems.groth16 import Groth16
    g16 = Groth16(bn254)
    kp = g16.generator(cs, seed=5)
    proof = g16.prover(kp.pk, primary, aux, seed=6)
    assert g16.verifier_strong_IC(kp.vk, primary, proof)
