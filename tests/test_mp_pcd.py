"""Multi-predicate PCD aggregation circuit (r1cs_mp_ppzkpcd pattern):
two predicates' proofs verified under WITNESS vks whose membership in
the committed vk set is proven in-circuit. Keys/outer-prove machinery
is shared with SpPCD (tested there); this pins the mp circuit logic.
"""
import pytest

from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.proof_systems.mp_pcd import MpPCD, vk_bits

from test_verifier_gadget import _trapdoor_groth16


def _example(curve, seed):
    from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
    from libsnark_tpu.relations.variable import Variable
    r = curve.r
    cs = R1CSConstraintSystem(r, 1, 2)
    x, a, b = Variable(1), Variable(2), Variable(3)
    cs.add_constraint(a, a, b)
    cs.add_constraint(a, b, x)
    a_val = 3 + seed
    return cs, [pow(a_val, 3, r)], [a_val, a_val * a_val % r]


@pytest.mark.slow
def test_mp_aggregation_circuit(bls377):
    from libsnark_tpu import get_curve
    bw6 = get_curve("bw6_761")
    mp = MpPCD(bls377, bw6)

    # two distinct "predicates" = two distinct inner keys
    cs1, prim1, aux1 = _example(bls377, 0)
    cs2, prim2, aux2 = _example(bls377, 1)
    vk1, proof1 = _trapdoor_groth16(bls377, cs1, prim1, aux1, seed=21)
    vk2, proof2 = _trapdoor_groth16(bls377, cs2, prim2, aux2, seed=22)
    vk3, proof3 = _trapdoor_groth16(bls377, cs1, prim1, aux1, seed=23)

    max_vks = 4
    acc = mp._accumulator(max_vks)
    acc.add(vk_bits(vk1, mp.coord_bits))
    acc.add(vk_bits(vk2, mp.coord_bits))
    root = acc.get_commitment()

    nbits = 8                      # statements fit 8 bits (see _example)
    pb, h = mp._build_outer(2, 1, nbits, max_vks)
    h["root"].generate_r1cs_witness(root)
    h["stmt_bits"][0][0].fill_with_bits_of_int(pb, prim1[0])
    h["stmt_bits"][1][0].fill_with_bits_of_int(pb, prim2[0])

    def fill_slot(i, vk, proof, memb):
        slot = h["slots"][i]
        slot["vk_var"].set_witness(vk)
        slot["verifier"].set_proof_witness(proof)
        slot["verifier"].generate_witness()
        for pg_c, lc, helper in slot["packs"]:
            pb.setval(helper, pb.lc_val(lc))
            pg_c.generate_r1cs_witness_from_packed()
        slot["hash"].generate_r1cs_witness()
        slot["addr"].fill_with_bits_of_int(pb, memb.address)
        slot["path"].generate_r1cs_witness(memb.address,
                                           memb.merkle_path)
        slot["memb"].generate_r1cs_witness()

    memb1 = acc.get_membership_proof(vk_bits(vk1, mp.coord_bits))
    memb2 = acc.get_membership_proof(vk_bits(vk2, mp.coord_bits))
    fill_slot(0, vk1, proof1, memb1)
    fill_slot(1, vk2, proof2, memb2)
    h["root"].generate_r1cs_witness(root)      # re-pin the public root
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # a valid proof under a vk OUTSIDE the set: only a stale membership
    # proof is available to the prover -> cannot satisfy
    fill_slot(0, vk3, proof3, memb1)
    h["root"].generate_r1cs_witness(root)
    assert pb.first_unsatisfied() is not None


@pytest.mark.slow
def test_mp_aggregation_circuit_cycle():
    """The same mp pattern instantiated on the MNT cycle (inner = mnt4
    proofs verified in an mnt6-field aggregation circuit): witness vk +
    set-membership, satisfied/corrupted. On a cycle this aggregation is
    itself recursable (see pcd_cycle.py)."""
    from libsnark_tpu import get_curve
    mnt4, mnt6 = get_curve("mnt4"), get_curve("mnt6")
    mp = MpPCD(mnt4, mnt6)

    cs1, prim1, aux1 = _example(mnt4, 0)
    vk1, proof1 = _trapdoor_groth16(mnt4, cs1, prim1, aux1, seed=31)
    vk2, _ = _trapdoor_groth16(mnt4, cs1, prim1, aux1, seed=32)

    max_vks = 4
    acc = mp._accumulator(max_vks)
    acc.add(vk_bits(vk1, mp.coord_bits))
    acc.add(vk_bits(vk2, mp.coord_bits))
    root = acc.get_commitment()

    nbits = 8
    pb, h = mp._build_outer(1, 1, nbits, max_vks)
    h["root"].generate_r1cs_witness(root)
    h["stmt_bits"][0][0].fill_with_bits_of_int(pb, prim1[0])
    slot = h["slots"][0]
    slot["vk_var"].set_witness(vk1)
    slot["verifier"].set_proof_witness(proof1)
    slot["verifier"].generate_witness()
    for pg_c, lc, helper in slot["packs"]:
        pb.setval(helper, pb.lc_val(lc))
        pg_c.generate_r1cs_witness_from_packed()
    slot["hash"].generate_r1cs_witness()
    memb = acc.get_membership_proof(vk_bits(vk1, mp.coord_bits))
    slot["addr"].fill_with_bits_of_int(pb, memb.address)
    slot["path"].generate_r1cs_witness(memb.address, memb.merkle_path)
    slot["memb"].generate_r1cs_witness()
    h["root"].generate_r1cs_witness(root)
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # corrupt: claim a vk NOT in the set (vk under a different trapdoor)
    vk3, proof3 = _trapdoor_groth16(mnt4, cs1, prim1, aux1, seed=33)
    slot["vk_var"].set_witness(vk3)
    slot["verifier"].set_proof_witness(proof3)
    slot["verifier"].generate_witness()
    for pg_c, lc, helper in slot["packs"]:
        pb.setval(helper, pb.lc_val(lc))
        pg_c.generate_r1cs_witness_from_packed()
    slot["hash"].generate_r1cs_witness()
    h["root"].generate_r1cs_witness(root)
    assert pb.first_unsatisfied() is not None
