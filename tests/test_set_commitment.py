"""Set commitment accumulator + gadget + knapsack CRH tests."""
import pytest

from libsnark_tpu.common.set_commitment import SetCommitmentAccumulator
from libsnark_tpu.gadgets.hashes.sha256_host import (
    sha256_two_to_one_hash_bits)
from libsnark_tpu.gadgets.set_commitment_gadget import (
    sha256_element_hash_bits, SetCommitmentGadget)
from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
from libsnark_tpu.gadgets.hashes.sha256_gadget import DigestVariable
from libsnark_tpu.relations.variable import LinearCombination

P = int("21888242871839275222246405745257275088"
        "548364400416034343698204186575808495617")


def _elt(i):
    return [(i >> (j % 8)) & 1 ^ (j * (i + 1) // 7) % 2
            for j in range(128)]


def test_accumulator_membership():
    acc = SetCommitmentAccumulator(
        8, 128, sha256_element_hash_bits, sha256_two_to_one_hash_bits)
    for i in range(5):
        acc.add(_elt(i))
    assert acc.is_in_set(_elt(3))
    assert not acc.is_in_set(_elt(7))
    proof = acc.get_membership_proof(_elt(3))
    assert proof.address == 3
    assert len(proof.merkle_path) == acc.depth


@pytest.mark.slow
def test_set_commitment_gadget():
    acc = SetCommitmentAccumulator(
        4, 128, sha256_element_hash_bits, sha256_two_to_one_hash_bits)
    for i in range(3):
        acc.add(_elt(i))
    pb = Protoboard(P)
    elt = PBVariableArray().allocate(pb, 128, "elt")
    root = DigestVariable(pb, 256, "root")
    g = SetCommitmentGadget(pb, 4, elt, root, LinearCombination(1), "sc")
    g.generate_r1cs_constraints()
    elt.fill_with_bits(pb, _elt(2))
    root.generate_r1cs_witness(acc.get_commitment())
    g.generate_r1cs_witness(acc.get_membership_proof(_elt(2)))
    assert pb.is_satisfied()
    # wrong root fails
    bad = list(acc.get_commitment())
    bad[5] ^= 1
    root.generate_r1cs_witness(bad)
    assert not pb.is_satisfied()


def test_knapsack_crh():
    from libsnark_tpu.gadgets.hashes.knapsack import (
        KnapsackCRHFieldOutGadget, KnapsackCRHBitOutGadget,
        knapsack_crh_field_eval, knapsack_crh_bit_eval)
    from libsnark_tpu.gadgets.protoboard import PBVariable
    pb = Protoboard(P)
    bits = PBVariableArray().allocate(pb, 64, "in")
    out = PBVariableArray().allocate(pb, 1, "out")
    g = KnapsackCRHFieldOutGadget(pb, bits, out, 1, "crh")
    g.generate_r1cs_constraints()
    data = [(i * 3) % 2 for i in range(64)]
    bits.fill_with_bits(pb, data)
    g.generate_r1cs_witness()
    assert pb.val(out[0]) == knapsack_crh_field_eval(P, data, 1)[0]
    assert pb.is_satisfied()

    pb2 = Protoboard(P)
    bits2 = PBVariableArray().allocate(pb2, 64, "in")
    obits = PBVariableArray().allocate(pb2, P.bit_length(), "ob")
    g2 = KnapsackCRHBitOutGadget(pb2, bits2, obits, 1, "crh2")
    g2.generate_r1cs_constraints()
    bits2.fill_with_bits(pb2, data)
    g2.generate_r1cs_witness()
    assert [pb2.val(b) for b in obits] == knapsack_crh_bit_eval(P, data, 1)
    assert pb2.is_satisfied()
