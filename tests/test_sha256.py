"""SHA-256 host oracle vs hashlib, and gadget vs host oracle
(reference test: gadgetlib1/.../sha256/tests/test_sha256_gadget.cpp)."""
import hashlib

from libsnark_tpu.gadgets.hashes.sha256_host import (
    sha256_compress, SHA256_H, words_to_bits, bits_to_words,
    sha256_two_to_one_hash_bits)


def _sha256_full(msg: bytes) -> bytes:
    """Padded SHA-256 built on sha256_compress, to check vs hashlib."""
    ml = len(msg) * 8
    msg = msg + b"\x80"
    while (len(msg) % 64) != 56:
        msg += b"\x00"
    msg += ml.to_bytes(8, "big")
    state = list(SHA256_H)
    for off in range(0, len(msg), 64):
        block = [int.from_bytes(msg[off + 4 * i: off + 4 * i + 4], "big")
                 for i in range(16)]
        state = sha256_compress(state, block)
    return b"".join(w.to_bytes(4, "big") for w in state)


def test_host_compress_matches_hashlib():
    for data in [b"", b"abc", b"a" * 55, b"b" * 64, b"c" * 130]:
        assert _sha256_full(data) == hashlib.sha256(data).digest()


def test_bits_roundtrip():
    words = [0x01234567, 0x89ABCDEF] * 4
    assert bits_to_words(words_to_bits(words)) == words


def test_two_to_one_gadget_matches_host():
    from libsnark_tpu.gadgets.protoboard import Protoboard
    from libsnark_tpu.gadgets.hashes.sha256_gadget import (
        DigestVariable, SHA256TwoToOneHashGadget)

    P = int("21888242871839275222246405745257275088"
            "548364400416034343698204186575808495617")
    pb = Protoboard(P)
    left = DigestVariable(pb, 256, "left")
    right = DigestVariable(pb, 256, "right")
    output = DigestVariable(pb, 256, "output")
    g = SHA256TwoToOneHashGadget(pb, left, right, output, "h")
    g.generate_r1cs_constraints()

    lbits = [(i * 7) % 2 for i in range(256)]
    rbits = [(i * 5 + 1) % 2 for i in range(256)]
    left.generate_r1cs_witness(lbits)
    right.generate_r1cs_witness(rbits)
    g.generate_r1cs_witness()

    expect = sha256_two_to_one_hash_bits(lbits, rbits)
    assert output.get_digest() == expect
    assert pb.is_satisfied()
    # tamper: flip one output bit
    pb.setval(output.bits[3], 1 - pb.val(output.bits[3]))
    assert not pb.is_satisfied()
