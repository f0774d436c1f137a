"""ADSNARK round trip: authenticate data, prove, verify (symmetric +
public paths), negative cases (reference run_r1cs_ppzkadsnark
harness + demo_r1cs_ppzkadsnark)."""
import pytest

from libsnark_tpu.relations.examples import generate_r1cs_example


def test_auth_layer(bn254):
    from libsnark_tpu.proof_systems.adsnark import ADSNARK
    ads = ADSNARK(bn254)
    keys = ads.auth_generator(seed=1)
    data = [11, 22, 33]
    labels = [b"l0", b"l1", b"l2"]
    auth = ads.auth_sign(data, keys.sak, labels, seed=2)
    assert ads.auth_verify_sec(data, auth, keys.sak, labels)
    assert ads.auth_verify_pub(data, auth, keys.pak, labels)
    bad = [12, 22, 33]
    assert not ads.auth_verify_sec(bad, auth, keys.sak, labels)
    assert not ads.auth_verify_pub(bad, auth, keys.pak, labels)


@pytest.mark.slow
def test_adsnark_round_trip(bn254):
    from libsnark_tpu.proof_systems.adsnark import ADSNARK
    ads = ADSNARK(bn254)
    keys = ads.auth_generator(seed=3)
    cs, primary, aux = generate_r1cs_example(bn254.r, 8, 2)
    labels = [b"input0", b"input1"]
    auth = ads.auth_sign(primary, keys.sak, labels, seed=4)
    kp = ads.generator(cs, keys.pap, seed=5)
    proof = ads.prover(kp.pk, primary, aux, auth, seed=6)
    assert ads.verifier_sec(kp.vk, proof, keys.sak, labels)
    assert ads.verifier_pub(kp.vk, auth, proof, keys.pak, labels)
    # authenticated data for DIFFERENT values must fail
    bad_auth = ads.auth_sign([(primary[0] + 1) % bn254.r, primary[1]],
                             keys.sak, labels, seed=7)
    assert not ads.verifier_pub(kp.vk, bad_auth, proof, keys.pak, labels)
    # wrong labels must fail the symmetric check
    assert not ads.verifier_sec(kp.vk, proof, keys.sak, [b"x0", b"x1"])
