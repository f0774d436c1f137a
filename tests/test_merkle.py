"""Merkle tree host structure + check-read / check-update gadgets
(reference tests: gadgetlib1/gadgets/merkle_tree/tests)."""
import pytest

from libsnark_tpu.common.merkle_tree import MerkleTree
from libsnark_tpu.gadgets.hashes.sha256_host import (
    sha256_two_to_one_hash_bits)
from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
from libsnark_tpu.gadgets.hashes.sha256_gadget import DigestVariable
from libsnark_tpu.gadgets.merkle_tree_gadgets import (
    MerkleAuthenticationPathVariable, MerkleTreeCheckReadGadget,
    MerkleTreeCheckUpdateGadget)
from libsnark_tpu.relations.variable import LinearCombination

P = int("21888242871839275222246405745257275088"
        "548364400416034343698204186575808495617")


def _leaf(i):
    return [(i * 37 + j * 11 + 1) % 2 for j in range(256)]


def test_host_tree_paths_verify():
    depth = 3
    t = MerkleTree(depth, 256, sha256_two_to_one_hash_bits)
    for a in [0, 3, 5]:
        t.set_value(a, _leaf(a))
    root = t.get_root()
    for address in [0, 3, 5, 6]:
        path = t.get_path(address)
        cur = t._pad(t.get_value(address))
        for layer in range(depth, 0, -1):
            sibling = path[layer - 1]
            bit = (address >> (depth - layer)) & 1
            cur = (sha256_two_to_one_hash_bits(sibling, cur) if bit
                   else sha256_two_to_one_hash_bits(cur, sibling))
        assert cur == root


@pytest.mark.slow
def test_check_read_gadget():
    depth = 2
    t = MerkleTree(depth, 256, sha256_two_to_one_hash_bits)
    for a in range(4):
        t.set_value(a, _leaf(a))
    address = 2
    pb = Protoboard(P)
    addr_bits = PBVariableArray().allocate(pb, depth, "addr")
    leaf = DigestVariable(pb, 256, "leaf")
    root = DigestVariable(pb, 256, "root")
    path = MerkleAuthenticationPathVariable(pb, depth, "path")
    g = MerkleTreeCheckReadGadget(
        pb, depth, addr_bits, leaf, root, path,
        LinearCombination(1), "read")
    path.generate_r1cs_constraints()
    g.generate_r1cs_constraints()

    addr_bits.fill_with_bits_of_int(pb, address)
    leaf.generate_r1cs_witness(t._pad(t.get_value(address)))
    root.generate_r1cs_witness(t.get_root())
    path.generate_r1cs_witness(address, t.get_path(address))
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
    # wrong root must fail
    bad_root = list(t.get_root())
    bad_root[0] ^= 1
    root.generate_r1cs_witness(bad_root)
    assert not pb.is_satisfied()


@pytest.mark.slow
def test_check_update_gadget():
    depth = 2
    t = MerkleTree(depth, 256, sha256_two_to_one_hash_bits)
    for a in range(4):
        t.set_value(a, _leaf(a))
    address = 1
    prev_root = t.get_root()
    prev_leaf_bits = t._pad(t.get_value(address))
    prev_path = t.get_path(address)
    new_leaf_bits = _leaf(99)
    t.set_value(address, new_leaf_bits)
    next_root = t.get_root()
    next_path = t.get_path(address)

    pb = Protoboard(P)
    addr_bits = PBVariableArray().allocate(pb, depth, "addr")
    prev_leaf = DigestVariable(pb, 256, "prev_leaf")
    prev_root_v = DigestVariable(pb, 256, "prev_root")
    prev_pv = MerkleAuthenticationPathVariable(pb, depth, "prev_path")
    next_leaf = DigestVariable(pb, 256, "next_leaf")
    next_root_v = DigestVariable(pb, 256, "next_root")
    next_pv = MerkleAuthenticationPathVariable(pb, depth, "next_path")
    g = MerkleTreeCheckUpdateGadget(
        pb, depth, addr_bits, prev_leaf, prev_root_v, prev_pv,
        next_leaf, next_root_v, next_pv, LinearCombination(1), "upd")
    g.generate_r1cs_constraints()

    addr_bits.fill_with_bits_of_int(pb, address)
    prev_leaf.generate_r1cs_witness(prev_leaf_bits)
    prev_root_v.generate_r1cs_witness(prev_root)
    prev_pv.generate_r1cs_witness(address, prev_path)
    next_leaf.generate_r1cs_witness(t._pad(new_leaf_bits))
    next_root_v.generate_r1cs_witness(next_root)
    next_pv.generate_r1cs_witness(address, next_path)
    g.generate_r1cs_witness()
    assert pb.is_satisfied()
