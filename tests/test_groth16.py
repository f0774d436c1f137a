"""End-to-end Groth16: generate -> prove -> verify (the reference's
run_r1cs_gg_ppzksnark.tcc:67-127 round-trip, minus serialization which is
tested separately)."""
import pytest

from libsnark_tpu import get_curve
from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.proof_systems.groth16 import Groth16


@pytest.fixture(scope="module")
def bn():
    return get_curve("alt_bn128")


def test_r1cs_example_satisfied(bn):
    cs, primary, aux = generate_r1cs_example(bn.r, 50, 3)
    assert cs.is_valid()
    assert cs.is_satisfied(primary, aux)
    bad = list(aux)
    bad[-1] = (bad[-1] + 1) % bn.r
    assert not cs.is_satisfied(primary, bad)


def test_groth16_end_to_end(bn):
    cs, primary, aux = generate_r1cs_example(bn.r, 30, 2)
    g16 = Groth16(bn)
    kp = g16.generator(cs, seed=42)
    proof = g16.prover(kp.pk, primary, aux, seed=7)
    assert g16.verifier_strong_IC(kp.vk, primary, proof)
    # wrong input rejected
    bad = list(primary)
    bad[0] = (bad[0] + 1) % bn.r
    assert not g16.verifier_strong_IC(kp.vk, bad, proof)
    # corrupted proof rejected
    tam = type(proof)(g_A=proof.g_A, g_B=proof.g_B,
                      g_C=proof.g_C + bn.G1.one())
    assert not g16.verifier_strong_IC(kp.vk, primary, tam)


def test_groth16_deterministic_with_seed(bn):
    cs, primary, aux = generate_r1cs_example(bn.r, 20, 2)
    g16 = Groth16(bn)
    kp1 = g16.generator(cs, seed=5)
    kp2 = g16.generator(cs, seed=5)
    p1 = g16.prover(kp1.pk, primary, aux, seed=9)
    p2 = g16.prover(kp2.pk, primary, aux, seed=9)
    assert p1 == p2


def test_groth16_online_verifier_and_affine(bls377):
    """verifier_process_vk + online verifiers + affine variant agree
    with the standard verifier (run_r1cs_gg_ppzksnark.tcc:67-127
    online-path parity; proofs host-built from the setup trapdoor)."""
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.proof_systems.groth16 import Groth16
    from test_verifier_gadget import _trapdoor_groth16

    cs, primary, aux = generate_r1cs_example(bls377.r, 6, 2)
    vk, proof = _trapdoor_groth16(bls377, cs, primary, aux, seed=5)
    g16 = Groth16(bls377)
    assert g16.verifier_strong_IC(vk, primary, proof)
    pvk = g16.verifier_process_vk(vk)
    assert g16.online_verifier_strong_IC(pvk, primary, proof)
    assert g16.online_verifier_weak_IC(pvk, primary, proof)
    assert g16.verifier_affine(vk, primary, proof)
    bad = [(primary[0] + 1) % bls377.r] + primary[1:]
    assert not g16.online_verifier_strong_IC(pvk, bad, proof)
    assert not g16.online_verifier_strong_IC(pvk, primary[:1], proof)
