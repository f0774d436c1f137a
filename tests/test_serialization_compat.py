"""libsnark-compat grammar: round trips + committed golden vectors.

The libsnark-side framing (field order, OUTPUT_NEWLINE tokens, container
grammars) is reconstructed from visible reference sources (see
libsnark_compat.py header); the libff element encoding is pinned and the
golden files under tests/golden/ freeze the full byte stream.
"""
import io
import os
import random

import pytest

from libsnark_tpu.libsnark_compat import LibsnarkCompatCodec
from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.reductions.r1cs_to_qap import (
    qap_domain, qap_instance_map_with_evaluation)
from libsnark_tpu.proof_systems.groth16 import (
    Groth16, Groth16VerificationKey, Groth16Proof)
from libsnark_tpu.ops.fp import FpKernel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _trapdoor_gamma1(curve, cs, primary, aux, seed=1234):
    """Host-built (vk, proof) with gamma = 1 (the clearmatics gg
    convention the compat vk grammar assumes)."""
    rng = random.Random(seed)
    r = curve.r
    t, alpha, beta, delta, rr, ss = (rng.randrange(1, r) for _ in range(6))
    gamma = 1
    fr = FpKernel(curve.fr_params)
    domain = qap_domain(fr, curve.fr_params, cs)
    qap = qap_instance_map_with_evaluation(cs, domain, t)
    full = [1] + [v % r for v in primary] + [v % r for v in aux]
    k = cs.num_inputs
    A_e = (alpha + sum(s * a for s, a in zip(full, qap.At)) + rr * delta) % r
    B_e = (beta + sum(s * b for s, b in zip(full, qap.Bt)) + ss * delta) % r
    pub_e = sum(full[i] * (beta * qap.At[i] + alpha * qap.Bt[i] + qap.Ct[i])
                for i in range(k + 1)) % r
    C_e = (A_e * B_e - alpha * beta - pub_e) * pow(delta, -1, r) % r
    G1, G2 = curve.G1.one(), curve.G2.one()
    vk = Groth16VerificationKey(
        alpha_g1=G1 * alpha, beta_g2=G2 * beta, gamma_g2=G2 * gamma,
        delta_g2=G2 * delta,
        gamma_ABC=[G1 * ((beta * qap.At[i] + alpha * qap.Bt[i] + qap.Ct[i])
                         % r) for i in range(k + 1)])
    proof = Groth16Proof(g_A=G1 * A_e, g_B=G2 * B_e, g_C=G1 * C_e)
    return vk, proof


@pytest.fixture(scope="module")
def fixture_objs(bn254):
    cs, primary, aux = generate_r1cs_example(bn254.r, 5, 2)
    vk, proof = _trapdoor_gamma1(bn254, cs, primary, aux)
    return bn254, cs, primary, vk, proof


def test_vk_round_trip(fixture_objs):
    curve, cs, primary, vk, proof = fixture_objs
    codec = LibsnarkCompatCodec(curve)
    data = codec.dumps(codec.write_groth16_vk, vk)
    vk2 = codec.loads(codec.read_groth16_vk, data)
    assert vk2.alpha_g1 == vk.alpha_g1
    assert vk2.beta_g2 == vk.beta_g2
    assert vk2.delta_g2 == vk.delta_g2
    assert vk2.gamma_ABC == vk.gamma_ABC
    # trapdoor proof still verifies against the re-read vk
    g16 = Groth16(curve)
    assert g16.verifier_strong_IC(vk2, primary, proof)


def test_proof_round_trip(fixture_objs):
    curve, cs, primary, vk, proof = fixture_objs
    codec = LibsnarkCompatCodec(curve)
    data = codec.dumps(codec.write_groth16_proof, proof)
    proof2 = codec.loads(codec.read_groth16_proof, data)
    assert proof2 == proof


def test_r1cs_round_trip(fixture_objs):
    curve, cs, primary, vk, proof = fixture_objs
    codec = LibsnarkCompatCodec(curve)
    data = codec.dumps(codec.write_r1cs, cs)
    cs2 = codec.loads(codec.read_r1cs, data)
    assert cs2.num_constraints == cs.num_constraints
    assert cs2.primary_input_size == cs.primary_input_size
    assert cs2.auxiliary_input_size == cs.auxiliary_input_size
    d1 = codec.dumps(codec.write_r1cs, cs2)
    assert d1 == data


def test_gamma_not_one_rejected(fixture_objs, bn254):
    curve, cs, primary, vk, proof = fixture_objs
    bad = Groth16VerificationKey(
        alpha_g1=vk.alpha_g1, beta_g2=vk.beta_g2,
        gamma_g2=curve.G2.one() * 7, delta_g2=vk.delta_g2,
        gamma_ABC=vk.gamma_ABC)
    codec = LibsnarkCompatCodec(curve)
    with pytest.raises(ValueError):
        codec.dumps(codec.write_groth16_vk, bad)


def test_golden_vectors(fixture_objs):
    """Byte-exact pin of the grammar against committed golden files."""
    curve, cs, primary, vk, proof = fixture_objs
    codec = LibsnarkCompatCodec(curve)
    blobs = {
        "groth16_vk.txt": codec.dumps(codec.write_groth16_vk, vk),
        "groth16_proof.txt": codec.dumps(codec.write_groth16_proof, proof),
        "r1cs.txt": codec.dumps(codec.write_r1cs, cs),
    }
    os.makedirs(GOLDEN, exist_ok=True)
    for name, data in blobs.items():
        path = os.path.join(GOLDEN, name)
        if not os.path.exists(path):      # first run: write the golden
            with open(path, "w") as f:
                f.write(data)
        with open(path) as f:
            assert f.read() == data, f"golden mismatch: {name}"
