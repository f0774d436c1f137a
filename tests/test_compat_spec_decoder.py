"""From-spec container-grammar decoder vs the committed goldens (r5).

The decoder (libsnark_tpu/compat_spec_decoder.py) is transcribed from
the reference's .tcc operator<< bodies, independently of this repo's
writer. Parsing the committed golden files with it — then validating
the decoded objects SEMANTICALLY (curve membership, proof verification,
constraint satisfaction) — cross-checks the writer against the spec.
The only layer this cannot verify is the libff element token encoding
(empty submodule; pinned convention documented in both modules).
"""
import os
import random

import pytest

from libsnark_tpu.compat_spec_decoder import SpecDecoder, SpecStream
from libsnark_tpu.libsnark_compat import LibsnarkCompatCodec
from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.relations.r1cs import R1CSConstraintSystem
from libsnark_tpu.proof_systems.groth16 import (
    Groth16, Groth16VerificationKey, Groth16Proof)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _read(name):
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read()


def _g1(curve, p):
    if p.is_zero:
        return curve.G1.zero()
    P = curve.G1.point(p.x, p.y)
    assert curve.G1.is_on_curve(P.x, P.y), "decoded G1 off-curve"
    return P


def _g2(curve, p):
    if p.is_zero:
        return curve.G2.zero()
    F = curve.G2.F
    P = curve.G2.point(F(*p.x), F(*p.y))
    assert curve.G2.is_on_curve(P.x, P.y), "decoded G2 off-curve"
    return P


@pytest.fixture(scope="module")
def golden_inputs(bn254):
    cs, primary, aux = generate_r1cs_example(bn254.r, 5, 2)
    return bn254, cs, primary, aux


def test_spec_decoder_vk_semantic(golden_inputs):
    """Decode the golden vk + proof with the from-spec decoder and run
    the REAL verifier on the decoded objects."""
    curve, cs, primary, aux = golden_inputs
    dec = SpecDecoder()
    s_vk = SpecStream(_read("groth16_vk.txt"))
    vk_s = dec.verification_key(s_vk)
    assert s_vk.at_end(), "vk stream has trailing bytes"
    s_pf = SpecStream(_read("groth16_proof.txt"))
    pf_s = dec.proof(s_pf)
    assert s_pf.at_end(), "proof stream has trailing bytes"

    # container structure: ABC is an accumulation vector with a dense
    # rest covering indices 1..num_inputs
    assert vk_s.ABC_g1.rest.domain_size == cs.num_inputs
    assert vk_s.ABC_g1.rest.indices == list(range(cs.num_inputs))
    assert len(vk_s.ABC_g1.rest.values) == cs.num_inputs

    # semantic: rebuild host objects (constructors check the curve
    # equation) and verify the proof
    vk = Groth16VerificationKey(
        alpha_g1=_g1(curve, vk_s.alpha_g1),
        beta_g2=_g2(curve, vk_s.beta_g2),
        gamma_g2=curve.G2.one(),              # gg convention: gamma = 1
        delta_g2=_g2(curve, vk_s.delta_g2),
        gamma_ABC=[_g1(curve, vk_s.ABC_g1.first)]
        + [_g1(curve, v) for v in vk_s.ABC_g1.rest.values])
    proof = Groth16Proof(g_A=_g1(curve, pf_s.g_A),
                         g_B=_g2(curve, pf_s.g_B),
                         g_C=_g1(curve, pf_s.g_C))
    g16 = Groth16(curve)
    assert g16.verifier_strong_IC(vk, primary, proof)
    assert not g16.verifier_strong_IC(
        vk, [(primary[0] + 1) % curve.r], proof)


def test_spec_decoder_r1cs_semantic(golden_inputs):
    """Decode the golden r1cs and check satisfaction of the example
    witness through the repo's R1CS machinery."""
    curve, cs, primary, aux = golden_inputs
    dec = SpecDecoder()
    st = SpecStream(_read("r1cs.txt"))
    cs_s = dec.constraint_system(st)
    assert st.at_end(), "r1cs stream has trailing bytes"
    assert cs_s.primary_input_size == cs.primary_input_size
    assert cs_s.auxiliary_input_size == cs.auxiliary_input_size
    assert len(cs_s.constraints) == cs.num_constraints

    from libsnark_tpu.relations.variable import (
        LinearCombination, LinearTerm)

    def lc_of(spec_lc):
        lc = LinearCombination()
        lc.terms = [LinearTerm(i, co % curve.r) for i, co in spec_lc.terms]
        return lc

    rebuilt = R1CSConstraintSystem(curve.r)
    rebuilt.primary_input_size = cs_s.primary_input_size
    rebuilt.auxiliary_input_size = cs_s.auxiliary_input_size
    for a, b, c in cs_s.constraints:
        rebuilt.add_constraint(lc_of(a), lc_of(b), lc_of(c))
    assert rebuilt.is_satisfied(primary, aux)
    bad_aux = list(aux)
    bad_aux[0] = (bad_aux[0] + 1) % curve.r
    assert not rebuilt.is_satisfied(primary, bad_aux)


def test_spec_decoder_agrees_with_repo_reader(golden_inputs):
    """Field-by-field agreement between the from-spec decoder and the
    repo's own reader on the same golden bytes."""
    curve, cs, primary, aux = golden_inputs
    codec = LibsnarkCompatCodec(curve)
    dec = SpecDecoder()
    vk_r = codec.loads(codec.read_groth16_vk, _read("groth16_vk.txt"))
    vk_s = dec.verification_key(SpecStream(_read("groth16_vk.txt")))
    assert _g1(curve, vk_s.alpha_g1) == vk_r.alpha_g1
    assert _g2(curve, vk_s.beta_g2) == vk_r.beta_g2
    assert _g2(curve, vk_s.delta_g2) == vk_r.delta_g2
    got_abc = [_g1(curve, vk_s.ABC_g1.first)] + [
        _g1(curve, v) for v in vk_s.ABC_g1.rest.values]
    assert got_abc == vk_r.gamma_ABC
