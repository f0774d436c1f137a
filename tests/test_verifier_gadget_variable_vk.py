"""Variable-vk Groth16 verifier gadget (reference
r1cs_ppzksnark_verifier_gadget.hpp:35-244: verification key as WITNESS)
+ the mp-PCD vk-membership pattern (mp_pcd_circuits.hpp:99-106):
verify under a witness vk while proving that vk belongs to a committed
set of accepted verification keys."""
import pytest

from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariable, \
    PBVariableArray
from libsnark_tpu.gadgets.pairing_gadgets import PairingGadgets, G1Gadgets
from libsnark_tpu.gadgets.verifier_gadgets import (
    Groth16VerificationKeyVariable, Groth16VerifierGadgetVariableVK)

from test_verifier_gadget import _trapdoor_groth16

NBITS_INPUT = 8          # keep the in-circuit IC ladder small


def _small_input_example(curve):
    """Tiny R1CS whose primary input fits NBITS_INPUT bits."""
    cs, primary, aux = generate_r1cs_example(curve.r, 4, 1)
    # generate_r1cs_example yields arbitrary field primaries; rebuild a
    # satisfying assignment with a small primary by scaling: simplest is
    # to retry the example generator's seed knob via direct construction
    from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
    from libsnark_tpu.relations.variable import Variable
    r = curve.r
    cs = R1CSConstraintSystem(r, 1, 2)
    x, a, b = Variable(1), Variable(2), Variable(3)
    # constraints: a * a = b ; a * b = x  (x = a^3)
    cs.add_constraint(a, a, b)
    cs.add_constraint(a, b, x)
    a_val = 5
    primary = [pow(a_val, 3, r)]          # 125 < 2^8
    aux = [a_val, a_val * a_val % r]
    assert cs.is_satisfied(primary, aux)
    return cs, primary, aux


@pytest.mark.slow
def test_variable_vk_verifier(bls377):
    cs, primary, aux = _small_input_example(bls377)
    vk, proof = _trapdoor_groth16(bls377, cs, primary, aux)

    pb = Protoboard(bls377.q)
    pg = PairingGadgets(pb, bls377, "pair")
    g1 = G1Gadgets(pb, "g1")
    vk_var = Groth16VerificationKeyVariable(pb, pg, g1, num_inputs=1)
    bits = PBVariableArray().allocate(pb, NBITS_INPUT, "input_bits")
    gadget = Groth16VerifierGadgetVariableVK(
        pb, bls377, vk_var, [list(bits)])
    bits.fill_with_bits_of_int(pb, primary[0] % bls377.r)
    vk_var.set_witness(vk)
    gadget.set_proof_witness(proof)
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # flip an input bit -> fails
    pb.setval(bits[0], 1 - pb.val(bits[0]))
    gadget.generate_witness()
    assert pb.first_unsatisfied() is not None
    pb.setval(bits[0], 1 - pb.val(bits[0]))

    # swap in a DIFFERENT (otherwise valid) vk as witness -> fails
    vk2, _ = _trapdoor_groth16(bls377, cs, primary, aux, seed=1313)
    vk_var.set_witness(vk2)
    gadget.generate_witness()
    assert pb.first_unsatisfied() is not None


@pytest.mark.slow
def test_mp_style_vk_membership(bls377):
    """mp-PCD pattern: the witness vk must hash into a committed set of
    accepted vks (set-commitment of translation vks,
    r1cs_mp_ppzkpcd.tcc:246,401)."""
    from libsnark_tpu.common.set_commitment import SetCommitmentAccumulator
    from libsnark_tpu.gadgets.set_commitment_gadget import (
        SetCommitmentGadget, sha256_element_hash_bits)
    from libsnark_tpu.gadgets.hashes.sha256_host import (
        sha256_two_to_one_hash_bits)
    from libsnark_tpu.gadgets.hashes.sha256_gadget import DigestVariable
    from libsnark_tpu.gadgets.basic import PackingGadget
    from libsnark_tpu.relations.variable import LinearCombination

    FP_BITS = 24          # per-coordinate fingerprint width (test scale;
    #                       full coordinate bits exceed one SHA block)

    cs, primary, aux = _small_input_example(bls377)
    vk1, proof1 = _trapdoor_groth16(bls377, cs, primary, aux, seed=7)
    vk2, _ = _trapdoor_groth16(bls377, cs, primary, aux, seed=8)

    def vk_fingerprint_bits(vk):
        coords = [vk.alpha_g1.x, vk.alpha_g1.y]
        for pt in (vk.beta_g2, vk.gamma_g2, vk.delta_g2):
            coords += [pt.x.c0, pt.x.c1, pt.y.c0, pt.y.c1]
        for pt in vk.gamma_ABC:
            coords += [pt.x, pt.y]
        bits = []
        for c in coords:
            v = int(c) & ((1 << FP_BITS) - 1)
            bits += [(v >> i) & 1 for i in range(FP_BITS)]
        return bits

    leaf1 = vk_fingerprint_bits(vk1)
    nbits_leaf = len(leaf1)
    assert nbits_leaf <= 512, "leaf must fit one SHA-256 block"
    acc = SetCommitmentAccumulator(4, nbits_leaf, sha256_element_hash_bits,
                                   sha256_two_to_one_hash_bits)
    acc.add(leaf1)
    acc.add(vk_fingerprint_bits(vk2))
    root = acc.get_commitment()
    memb1 = acc.get_membership_proof(leaf1)

    pb = Protoboard(bls377.q)
    pg = PairingGadgets(pb, bls377, "pair")
    g1 = G1Gadgets(pb, "g1")
    vk_var = Groth16VerificationKeyVariable(pb, pg, g1, num_inputs=1)
    bits = PBVariableArray().allocate(pb, NBITS_INPUT, "input_bits")
    verifier = Groth16VerifierGadgetVariableVK(
        pb, bls377, vk_var, [list(bits)])

    # bind each vk coordinate's low FP_BITS bits to the committed leaf
    leaf_vars = []
    pack_gadgets = []
    for idx, lc in enumerate(vk_var.coordinate_lcs()):
        cbits = PBVariableArray().allocate(pb, FP_BITS, f"vkb{idx}")
        low = PBVariable().allocate(pb, f"vklow{idx}")
        pg_fp = PackingGadget(pb, cbits, low, f"vkp{idx}")
        pg_fp.generate_r1cs_constraints(True)
        pack_gadgets.append((pg_fp, lc, low))
        leaf_vars += list(cbits)
    # NB: low-bit binding is a fingerprint; full binding would range-
    # decompose the whole coordinate (reference binds all vk bits)

    root_var = DigestVariable(pb, 256, "root")
    sc = SetCommitmentGadget(pb, 4, leaf_vars, root_var,
                             LinearCombination(1), "sc")
    sc.generate_r1cs_constraints()

    def fill(vk, proof, memb):
        bits.fill_with_bits_of_int(pb, primary[0] % bls377.r)
        vk_var.set_witness(vk)
        verifier.set_proof_witness(proof)
        verifier.generate_witness()
        for pg_fp, lc, low in pack_gadgets:
            v = pb.lc_val(lc) & ((1 << FP_BITS) - 1)
            pb.setval(low, v)
            pg_fp.generate_r1cs_witness_from_packed()
        sc.generate_r1cs_witness(memb)
        # pin the PUBLIC root last: the check-read witness recomputes the
        # path root into the digest var, which must not free the root
        root_var.generate_r1cs_witness(root)

    fill(vk1, proof1, memb1)
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # a vk NOT in the set: stale membership proof cannot satisfy
    vk3, proof3 = _trapdoor_groth16(bls377, cs, primary, aux, seed=9)
    fill(vk3, proof3, memb1)
    assert pb.first_unsatisfied() is not None
