"""Serialization round-trip tests across all mode axes
(text/binary x montgomery x compressed), mirroring the reference's
reserialize-inside-integration-test pattern."""
import pytest

from libsnark_tpu.serialization import Codec, reserialize
from libsnark_tpu.relations.examples import generate_r1cs_example


@pytest.mark.parametrize("mode", ["text", "binary"])
@pytest.mark.parametrize("mont", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_point_roundtrip(bn254, mode, mont, compress):
    c = Codec(bn254, mode=mode, montgomery=mont, compress=compress)
    for P in [bn254.G1.zero(), bn254.G1.one(), bn254.G1.one() * 12345]:
        assert reserialize(c, c.write_g1, c.read_g1, P) == P
    for Q in [bn254.G2.zero(), bn254.G2.one(), bn254.G2.one() * 777]:
        assert reserialize(c, c.write_g2, c.read_g2, Q) == Q


@pytest.mark.parametrize("mode", ["text", "binary"])
def test_fr_and_r1cs_roundtrip(bn254, mode):
    c = Codec(bn254, mode=mode)
    vs = [0, 1, bn254.r - 1, 123456789]
    assert reserialize(c, c.write_fr_vector, c.read_fr_vector, vs) == vs
    cs, primary, aux = generate_r1cs_example(bn254.r, 10, 2)
    cs2 = reserialize(c, c.write_r1cs, c.read_r1cs, cs)
    assert cs2 == cs
    assert cs2.is_satisfied(primary, aux)


def test_groth16_vk_proof_roundtrip(bn254):
    """Serialization of vk+proof, then verification with the restored
    objects (run_r1cs_gg_ppzksnark.tcc:83-106 pattern)."""
    from libsnark_tpu.proof_systems.groth16 import Groth16
    g16 = Groth16(bn254)
    cs, primary, aux = generate_r1cs_example(bn254.r, 8, 2)
    kp = g16.generator(cs, seed=3)
    proof = g16.prover(kp.pk, primary, aux, seed=4)
    for mode in ("text", "binary"):
        for compress in (False, True):
            c = Codec(bn254, mode=mode, compress=compress)
            vk2 = reserialize(c, c.write_groth16_vk, c.read_groth16_vk,
                              kp.vk)
            proof2 = reserialize(c, c.write_groth16_proof,
                                 c.read_groth16_proof, proof)
            assert g16.verifier_strong_IC(vk2, primary, proof2)
