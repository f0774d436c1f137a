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


def test_r1p_specializations():
    """R1P gadget specializations (gadget.hpp:175,255,511,567,682,730,
    772,811): binary AND/OR, integer packing, equals-const, toggle,
    conditional flag, implication, comparison."""
    from libsnark_tpu.gadgetlib2 import (
        BinaryANDGadget, BinaryORGadget, IntegerPackingGadget,
        EqualsConstGadget, ToggleGadget, ConditionalFlagGadget,
        LogicImplicationGadget, ComparisonGadget,
        create_and_gadget, create_or_gadget)

    pb = GL2Protoboard.create(P)
    x, y = GL2Variable("x"), GL2Variable("y")
    a, o = GL2Variable("a"), GL2Variable("o")
    g_and = create_and_gadget(pb, [x, y], a)
    g_or = create_or_gadget(pb, [x, y], o)
    assert isinstance(g_and, BinaryANDGadget)
    assert isinstance(g_or, BinaryORGadget)
    g_and.generateConstraints()
    g_or.generateConstraints()
    for vx, vy in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        pb.setval(x, vx)
        pb.setval(y, vy)
        g_and.generateWitness()
        g_or.generateWitness()
        assert pb.val(a) == (vx & vy) and pb.val(o) == (vx | vy)
        assert pb.is_satisfied()

    # integer packing (no booleanity)
    pb2 = GL2Protoboard.create(P)
    bits = GL2VariableArray(6, "b")
    packed = GL2Variable("p")
    gp = IntegerPackingGadget(pb2, bits, packed)
    gp.generateConstraints()
    for i in range(6):
        pb2.setval(bits[i], (0x2D >> i) & 1)
    gp.generateWitness()
    assert pb2.val(packed) == 0x2D and pb2.is_satisfied()

    # equals-const
    pb3 = GL2Protoboard.create(P)
    inp, res = GL2Variable("i"), GL2Variable("r")
    ge = EqualsConstGadget(pb3, inp, 7, res)
    ge.generateConstraints()
    for v, want in [(7, 1), (9, 0)]:
        pb3.setval(inp, v)
        ge.generateWitness()
        assert pb3.val(res) == want and pb3.is_satisfied()

    # toggle
    pb4 = GL2Protoboard.create(P)
    t, z, one, out = (GL2Variable("t"), GL2Variable("z"),
                      GL2Variable("o1"), GL2Variable("out"))
    gt = ToggleGadget(pb4, t, z, one, out)
    gt.generateConstraints()
    pb4.setval(z, 11)
    pb4.setval(one, 22)
    for tv, want in [(0, 11), (1, 22)]:
        pb4.setval(t, tv)
        gt.generateWitness()
        assert pb4.val(out) == want and pb4.is_satisfied()

    # conditional flag + implication
    pb5 = GL2Protoboard.create(P)
    c, f = GL2Variable("c"), GL2Variable("f")
    gc = ConditionalFlagGadget(pb5, c, f)
    gc.generateConstraints()
    for cv, want in [(0, 0), (5, 1)]:
        pb5.setval(c, cv)
        gc.generateWitness()
        assert pb5.val(f) == want and pb5.is_satisfied()

    pb6 = GL2Protoboard.create(P)
    c6, f6 = GL2Variable("c"), GL2Variable("f")
    gi = LogicImplicationGadget(pb6, c6, f6)
    gi.generateConstraints()
    pb6.setval(c6, 3)
    gi.generateWitness()
    assert pb6.val(f6) == 1 and pb6.is_satisfied()
    pb6.setval(c6, 0)
    pb6.setval(f6, 0)
    gi.generateWitness()
    assert pb6.is_satisfied()

    # comparison
    pb7 = GL2Protoboard.create(P)
    lhs, rhs = GL2Variable("a"), GL2Variable("b")
    less, leq = GL2Variable("lt"), GL2Variable("le")
    gcmp = ComparisonGadget(pb7, 8, lhs, rhs, less, leq)
    gcmp.generateConstraints()
    for av, bv in [(3, 200), (200, 3), (42, 42)]:
        pb7.setval(lhs, av)
        pb7.setval(rhs, bv)
        gcmp.generateWitness()
        assert pb7.val(less) == int(av < bv)
        assert pb7.val(leq) == int(av <= bv)
        assert pb7.is_satisfied()


def test_dual_word_gadgets():
    from libsnark_tpu.gadgetlib2 import DualWordGadget, DualWordArrayGadget
    pb = GL2Protoboard.create(P)
    dw = DualWordGadget(pb, 8, "w")
    dw.generateConstraints()
    dw.generateWitness(0xA5)
    assert [pb.val(b) for b in dw.bits] == [(0xA5 >> i) & 1
                                            for i in range(8)]
    assert pb.is_satisfied()

    dwa = DualWordArrayGadget(pb, 3, 8, "wa")
    dwa.generateConstraints()
    dwa.generateWitness([1, 2, 3])
    assert pb.val(dwa.words[2].packed) == 3
    assert pb.is_satisfied()
