"""Protoboard + basic gadget tests (reference gadgetlib1 test pattern:
build gadget, generate witness, assert pb.is_satisfied())."""
import pytest

from libsnark_tpu.gadgets.protoboard import (
    Protoboard, PBVariable, PBVariableArray)
from libsnark_tpu.gadgets.basic import (
    PackingGadget, MultipackingGadget, DualVariableGadget,
    DisjunctionGadget, ConjunctionGadget, ComparisonGadget,
    InnerProductGadget, LooseMultiplexingGadget, field_capacity,
    multipacking_num_chunks)

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def test_packing_gadget_roundtrip():
    pb = Protoboard(P)
    bits = PBVariableArray().allocate(pb, 8, "bits")
    packed = PBVariable().allocate(pb, "packed")
    g = PackingGadget(pb, bits, packed, "pack")
    g.generate_r1cs_constraints(True)
    pb.setval(packed, 0xA7)
    g.generate_r1cs_witness_from_packed()
    assert pb.is_satisfied()
    assert bits.get_int_from_bits(pb) == 0xA7
    # from bits direction
    bits.fill_with_bits_of_int(pb, 0x5C)
    g.generate_r1cs_witness_from_bits()
    assert pb.val(packed) == 0x5C
    assert pb.is_satisfied()
    # non-boolean bit breaks it
    pb.setval(bits[0], 2)
    assert not pb.is_satisfied()


def test_multipacking_gadget():
    pb = Protoboard(P)
    nbits = 600   # wider than one field element
    chunk = field_capacity(P)
    nchunks = multipacking_num_chunks(P, nbits)
    bits = PBVariableArray().allocate(pb, nbits, "bits")
    packed = PBVariableArray().allocate(pb, nchunks, "packed")
    g = MultipackingGadget(pb, bits, packed, chunk, "mp")
    g.generate_r1cs_constraints(True)
    val = (1 << 599) | 0xDEADBEEF
    bits.fill_with_bits_of_int(pb, val)
    g.generate_r1cs_witness_from_bits()
    assert pb.is_satisfied()


def test_dual_variable_gadget():
    pb = Protoboard(P)
    g = DualVariableGadget(pb, 16, "dual")
    g.generate_r1cs_constraints(True)
    pb.setval(g.packed, 0xBEEF)
    g.generate_r1cs_witness_from_packed()
    assert pb.is_satisfied()
    assert g.bits.get_int_from_bits(pb) == 0xBEEF


@pytest.mark.parametrize("vals,expected_or,expected_and", [
    ([0, 0, 0], 0, 0),
    ([0, 1, 0], 1, 0),
    ([1, 1, 1], 1, 1),
])
def test_disjunction_conjunction(vals, expected_or, expected_and):
    pb = Protoboard(P)
    ins = PBVariableArray().allocate(pb, len(vals), "in")
    out_or = PBVariable().allocate(pb, "or")
    out_and = PBVariable().allocate(pb, "and")
    g1 = DisjunctionGadget(pb, ins, out_or, "disj")
    g2 = ConjunctionGadget(pb, ins, out_and, "conj")
    g1.generate_r1cs_constraints()
    g2.generate_r1cs_constraints()
    for v, x in zip(ins, vals):
        pb.setval(v, x)
    g1.generate_r1cs_witness()
    g2.generate_r1cs_witness()
    assert pb.val(out_or) == expected_or
    assert pb.val(out_and) == expected_and
    assert pb.is_satisfied()


@pytest.mark.parametrize("a,b,less,leq", [
    (3, 5, 1, 1), (5, 5, 0, 1), (7, 5, 0, 0), (0, 0, 0, 1),
])
def test_comparison_gadget(a, b, less, leq):
    pb = Protoboard(P)
    A = PBVariable().allocate(pb, "A")
    B = PBVariable().allocate(pb, "B")
    l = PBVariable().allocate(pb, "less")
    le = PBVariable().allocate(pb, "leq")
    g = ComparisonGadget(pb, 4, A, B, l, le, "cmp")
    g.generate_r1cs_constraints()
    pb.setval(A, a)
    pb.setval(B, b)
    g.generate_r1cs_witness()
    assert pb.val(l) == less and pb.val(le) == leq
    assert pb.is_satisfied()


def test_inner_product_gadget():
    pb = Protoboard(P)
    A = PBVariableArray().allocate(pb, 5, "A")
    B = PBVariableArray().allocate(pb, 5, "B")
    res = PBVariable().allocate(pb, "res")
    g = InnerProductGadget(pb, A, B, res, "ip")
    g.generate_r1cs_constraints()
    av = [3, 1, 4, 1, 5]
    bv = [2, 7, 1, 8, 2]
    for x, v in zip(A, av):
        pb.setval(x, v)
    for x, v in zip(B, bv):
        pb.setval(x, v)
    g.generate_r1cs_witness()
    assert pb.val(res) == sum(x * y for x, y in zip(av, bv)) % P
    assert pb.is_satisfied()


@pytest.mark.parametrize("idx,ok", [(2, 1), (9, 0)])
def test_loose_multiplexing(idx, ok):
    pb = Protoboard(P)
    arr = PBVariableArray().allocate(pb, 5, "arr")
    index = PBVariable().allocate(pb, "idx")
    result = PBVariable().allocate(pb, "res")
    flag = PBVariable().allocate(pb, "flag")
    g = LooseMultiplexingGadget(pb, arr, index, result, flag, "mux")
    g.generate_r1cs_constraints()
    vals = [10, 20, 30, 40, 50]
    for v, x in zip(arr, vals):
        pb.setval(v, x)
    pb.setval(index, idx)
    g.generate_r1cs_witness()
    assert pb.val(flag) == ok
    if ok:
        assert pb.val(result) == vals[idx]
    assert pb.is_satisfied()


def test_protoboard_to_proof_system():
    """Author a circuit on the protoboard, prove it with Groth16
    (integration parity: gadgetlib1 -> r1cs -> snark)."""
    from libsnark_tpu import get_curve
    from libsnark_tpu.proof_systems.groth16 import Groth16
    curve = get_curve("alt_bn128")
    pb = Protoboard(curve.r)
    x = PBVariable().allocate(pb, "x")      # public
    y = PBVariable().allocate(pb, "y")      # witness: y = x^3 + x + 5
    sq = PBVariable().allocate(pb, "x2")
    cb = PBVariable().allocate(pb, "x3")
    pb.set_input_sizes(1)
    pb.add_r1cs_constraint(x, x, sq, "x*x")
    pb.add_r1cs_constraint(sq, x, cb, "x2*x")
    from libsnark_tpu.relations.variable import LinearCombination
    pb.add_r1cs_constraint(1, LinearCombination(cb) + x + 5, y, "sum")
    pb.setval(x, 3)
    pb.setval(sq, 9)
    pb.setval(cb, 27)
    pb.setval(y, 35)
    assert pb.is_satisfied()
    cs = pb.get_constraint_system()
    assert cs.is_satisfied(pb.primary_input(), pb.auxiliary_input())
    g16 = Groth16(curve)
    kp = g16.generator(cs, seed=7)
    proof = g16.prover(kp.pk, pb.primary_input(), pb.auxiliary_input(),
                       seed=8)
    assert g16.verifier_strong_IC(kp.vk, pb.primary_input(), proof)


def test_gadget_from_r1cs():
    """Wrap a compiled R1CS inside a larger circuit (reference
    gadget_from_r1cs; the PCD cp_handler splice)."""
    from libsnark_tpu.gadgets.gadget_from_r1cs import GadgetFromR1CS
    from libsnark_tpu.relations.examples import generate_r1cs_example
    cs, primary, aux = generate_r1cs_example(P, 6, 2)
    pb = Protoboard(P)
    block = PBVariableArray().allocate(pb, 2, "pub")
    g = GadgetFromR1CS(pb, [block], cs, "wrap")
    g.generate_r1cs_constraints()
    g.generate_r1cs_witness(primary + aux)
    assert pb.is_satisfied()
    pb.setval(block[0], pb.val(block[0]) + 1)
    assert not pb.is_satisfied()


def test_constraint_profiler():
    from libsnark_tpu.gadgets.protoboard import ConstraintProfiler
    import io
    pb = Protoboard(P)
    prof = ConstraintProfiler(pb)
    bits = PBVariableArray().allocate(pb, 8, "bits")
    packed = PBVariable().allocate(pb, "packed")
    with prof.scope("packing"):
        PackingGadget(pb, bits, packed, "p").generate_r1cs_constraints(True)
    buf = io.StringIO()
    prof.print_profiling(buf)
    assert "packing: 9 constraints" in buf.getvalue()
