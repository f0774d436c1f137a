"""RFC 8032 Ed25519 (the reference's SUPERCOP dependency equivalent),
cross-validated against an independent implementation."""
import random

import pytest

from libsnark_tpu.common import ed25519


def _ref_available():
    try:
        from cryptography.hazmat.primitives.asymmetric import ed25519  # noqa
        return True
    except Exception:
        return False


def test_sign_verify_roundtrip():
    rng = random.Random(1)
    for i in range(4):
        seed = bytes(rng.getrandbits(8) for _ in range(32))
        msg = bytes(rng.getrandbits(8) for _ in range(rng.randrange(0, 100)))
        pk = ed25519.publickey(seed)
        sig = ed25519.sign(seed, msg)
        assert ed25519.verify(pk, msg, sig)
        assert not ed25519.verify(pk, msg + b"x", sig)
        bad = bytearray(sig)
        bad[3] ^= 1
        assert not ed25519.verify(pk, msg, bytes(bad))


@pytest.mark.skipif(not _ref_available(), reason="cryptography not present")
def test_cross_validate_against_independent_impl():
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey, Ed25519PublicKey)
    from cryptography.hazmat.primitives import serialization
    from cryptography.exceptions import InvalidSignature
    rng = random.Random(2)
    for i in range(4):
        seed = bytes(rng.getrandbits(8) for _ in range(32))
        msg = bytes(rng.getrandbits(8) for _ in range(i * 17))
        ref_sk = Ed25519PrivateKey.from_private_bytes(seed)
        ref_pk = ref_sk.public_key().public_bytes(
            serialization.Encoding.Raw, serialization.PublicFormat.Raw)
        # same public key derivation
        assert ed25519.publickey(seed) == ref_pk
        # our signature == theirs (Ed25519 signing is deterministic)
        assert ed25519.sign(seed, msg) == ref_sk.sign(msg)
        # they verify ours; we verify theirs
        Ed25519PublicKey.from_public_bytes(ref_pk).verify(
            ed25519.sign(seed, msg), msg)
        assert ed25519.verify(ref_pk, msg, ref_sk.sign(msg))
        with pytest.raises(InvalidSignature):
            Ed25519PublicKey.from_public_bytes(ref_pk).verify(
                ed25519.sign(seed, msg)[:-1] + b"\x00", msg)


def test_adsnark_auth_layer_with_ed25519(bn254):
    """ADSNARK public-auth mode over real Ed25519 (reference
    r1cs_ppzkadsnark with WITH_SUPERCOP)."""
    from libsnark_tpu.proof_systems.adsnark import ADSNARK
    ads = ADSNARK(bn254, sig_scheme="ed25519")
    keys = ads.auth_generator(seed=5)
    labels = [b"l0", b"l1", b"l2"]
    ins = [7, 11, 13]
    auth = ads.auth_sign(ins, keys.sak, labels, seed=6)
    assert ads.auth_verify_sec(ins, auth, keys.sak, labels)
    assert ads.auth_verify_pub(ins, auth, keys.pak, labels)
    assert not ads.auth_verify_pub([8, 11, 13], auth, keys.pak, labels)
