"""In-circuit MNT4/MNT6 pairing + Groth16 verifier gadgets — the two
halves of MNT-cycle recursion (reference gadgetlib1/gadgets/pairing/mnt/
mnt_pairing_params.hpp + verifiers/r1cs_ppzksnark_verifier_gadget.hpp,
instantiated at the cycle of common/default_types/r1cs_ppzkpcd_pp.hpp).

All host-side: constraint generation + satisfaction + bit-exact oracle
equality against curves/pairing.MNT{4,6}PairingEngine.
"""
import random

import pytest

from libsnark_tpu.curves import get_curve
from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
from libsnark_tpu.gadgets.mnt_pairing_gadgets import (
    MNTPairingGadgets, make_pairing_gadgets)
from libsnark_tpu.gadgets.pairing_gadgets import G1Gadgets


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_pairing_gadget_matches_host_oracle(name):
    c = get_curve(name)
    pb = Protoboard(c.q)
    pg = MNTPairingGadgets(pb, c)
    g1 = G1Gadgets(pb, a=c.a)
    rng = random.Random(5)
    P = c.G1.one() * rng.randrange(1, c.r)
    Q = c.G2.one() * rng.randrange(1, c.r)
    sP = g1.alloc(P)
    sQ, qv = pg.alloc_g2_point()
    pg.set_g2_witness(qv, Q)
    out = pg.final_exp(pg.miller_loop(pg.embed_g2(sQ), pg.embed_g1(sP)))
    g1.generate_witness()
    pg.generate_witness()
    assert pg.fp12.eval(out, pg.host_GT) == c.pairing(P, Q)
    assert pb.first_unsatisfied() is None


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_const_q_miller_matches_symbolic(name):
    """miller_loop_const_q (linear lines) must equal the fully-symbolic
    loop and the host engine."""
    c = get_curve(name)
    pb = Protoboard(c.q)
    pg = MNTPairingGadgets(pb, c)
    g1 = G1Gadgets(pb, a=c.a)
    rng = random.Random(9)
    P = c.G1.one() * rng.randrange(1, c.r)
    Q = c.G2.one() * rng.randrange(1, c.r)
    sP = g1.alloc(P)
    ml = pg.miller_loop_const_q(Q, pg.embed_g1(sP))
    g1.generate_witness()
    pg.generate_witness()
    eng = c.pairing_engine
    want = eng.miller_loop(eng.embed_g2(Q), eng.embed_g1(P))
    assert pg.fp12.eval(ml, pg.host_GT) == want
    assert pb.first_unsatisfied() is None


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
def test_groth16_verifier_gadget_cycle(name):
    """Hardcoded-vk Groth16 verifier gadget over each cycle curve: a
    trapdoor proof satisfies the circuit; a flipped input bit breaks the
    pairing check (reference
    test_r1cs_ppzksnark_verifier_gadget.cpp pattern)."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_verifier_gadget import _trapdoor_groth16
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.gadgets.verifier_gadgets import Groth16VerifierGadget
    from libsnark_tpu.proof_systems.groth16 import Groth16

    c = get_curve(name)
    cs, primary, aux = generate_r1cs_example(c.r, 4, 1)
    vk, proof = _trapdoor_groth16(c, cs, primary, aux)
    assert Groth16(c).verifier_strong_IC(vk, primary, proof)

    pb = Protoboard(c.q)
    bits = PBVariableArray().allocate(pb, c.r.bit_length(), "in")
    gad = Groth16VerifierGadget(pb, c, vk, [list(bits)])
    bits.fill_with_bits_of_int(pb, primary[0] % c.r)
    gad.set_proof_witness(proof)
    gad.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    pb.setval(bits[0], 1 - pb.val(bits[0]))
    gad.generate_witness()
    assert pb.first_unsatisfied() is not None


def test_make_pairing_gadgets_dispatch():
    mnt4 = get_curve("mnt4")
    pb = Protoboard(mnt4.q)
    assert isinstance(make_pairing_gadgets(pb, mnt4), MNTPairingGadgets)
    bls = get_curve("bls12_377")
    from libsnark_tpu.gadgets.pairing_gadgets import PairingGadgets
    pb2 = Protoboard(bls.q)
    assert type(make_pairing_gadgets(pb2, bls)) is PairingGadgets
