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


def test_bctv14_codec_round_trip(bn254):
    """Structural round trip of the BCTV14 vk/proof grammar (points are
    arbitrary valid group elements; cryptographic validity untested)."""
    from libsnark_tpu.serialization import Codec
    from libsnark_tpu.proof_systems.bctv14 import (
        BCTV14VerificationKey, BCTV14Proof)
    from libsnark_tpu.common.sparse_vector import (
        SparseVector, AccumulationVector)
    from libsnark_tpu.common.knowledge_commitment import KnowledgeCommitment

    G1, G2 = bn254.G1.one(), bn254.G2.one()
    vk = BCTV14VerificationKey(
        alphaA_g2=G2 * 3, alphaB_g1=G1 * 5, alphaC_g2=G2 * 7,
        gamma_g2=G2 * 11, gamma_beta_g1=G1 * 13, gamma_beta_g2=G2 * 17,
        rC_Z_g2=G2 * 19,
        encoded_IC_query=AccumulationVector(
            first=G1 * 23,
            rest=SparseVector([0, 2], [G1 * 29, G1 * 31], 3)))
    proof = BCTV14Proof(
        g_A=KnowledgeCommitment(G1 * 2, G1 * 4),
        g_B=KnowledgeCommitment(G2 * 6, G1 * 8),
        g_C=KnowledgeCommitment(G1 * 10, G1 * 12),
        g_H=G1 * 14, g_K=G1 * 16)
    for mode in ("text", "binary"):
        codec = Codec(bn254, mode=mode)
        vk2 = codec.loads(codec.read_bctv14_vk,
                          codec.dumps(codec.write_bctv14_vk, vk))
        assert vk2.alphaA_g2 == vk.alphaA_g2
        assert vk2.gamma_beta_g1 == vk.gamma_beta_g1
        assert vk2.encoded_IC_query.first == vk.encoded_IC_query.first
        assert vk2.encoded_IC_query.rest.indices == [0, 2]
        assert vk2.encoded_IC_query.rest.values == \
            vk.encoded_IC_query.rest.values
        pf2 = codec.loads(codec.read_bctv14_proof,
                          codec.dumps(codec.write_bctv14_proof, proof))
        assert pf2.g_A.g == proof.g_A.g and pf2.g_B.h == proof.g_B.h
        assert pf2.g_H == proof.g_H and pf2.g_K == proof.g_K


@pytest.mark.parametrize("name", ["mnt4", "mnt6"])
@pytest.mark.parametrize("compress", [False, True])
def test_point_roundtrip_mnt(name, compress):
    """Codec over the cycle curves, incl. compressed G2 over Fq3
    (cubic-extension Tonelli-Shanks sqrt)."""
    from libsnark_tpu import get_curve
    cu = get_curve(name)
    c = Codec(cu, mode="binary", compress=compress)
    for P in [cu.G1.zero(), cu.G1.one() * 12345]:
        assert reserialize(c, c.write_g1, c.read_g1, P) == P
    for Q in [cu.G2.zero(), cu.G2.one() * 777]:
        assert reserialize(c, c.write_g2, c.read_g2, Q) == Q


@pytest.mark.parametrize("mode", ["text", "binary"])
def test_cycle_pcd_proof_roundtrip(mode):
    """r1cs_sp_ppzkpcd_proof / ram_pcd_message serialization across the
    two cycle curves."""
    import io
    from libsnark_tpu.curves import get_curve
    from libsnark_tpu.serialization import (
        Codec, write_cycle_pcd_proof, read_cycle_pcd_proof,
        write_ram_pcd_message, read_ram_pcd_message)
    from libsnark_tpu.proof_systems.pcd_cycle import CyclePCDProof
    from libsnark_tpu.proof_systems.compliance_predicate import PCDMessage
    from libsnark_tpu.proof_systems.groth16 import Groth16Proof
    from libsnark_tpu.proof_systems.ram_zksnark import RamPCDMessage

    A, B = get_curve("mnt4"), get_curve("mnt6")
    ca, cb = Codec(A, mode=mode), Codec(B, mode=mode)
    msg = PCDMessage(type=1, payload=[5, 7, A.r - 1])
    pi = Groth16Proof(g_A=B.G1.one() * 3, g_B=B.G2.one() * 5,
                      g_C=B.G1.one() * 9)
    proof = CyclePCDProof(msg=msg, translation_proof=pi)
    buf = io.BytesIO()
    write_cycle_pcd_proof(ca, cb, buf, proof)
    back = read_cycle_pcd_proof(ca, cb, io.BytesIO(buf.getvalue()))
    assert back.msg == msg
    assert back.translation_proof.g_A == pi.g_A
    assert back.translation_proof.g_B == pi.g_B
    assert back.translation_proof.g_C == pi.g_C

    rmsg = RamPCDMessage(timestamp=9, root_initial=[1, 0, 1, 1],
                         root=[0, 1, 1, 0], pc_addr=3, regs=[4, 5],
                         flag=1, pc_addr_initial=0, regs_initial=[0, 0],
                         flag_initial=0, has_accepted=1)
    buf2 = io.BytesIO()
    write_ram_pcd_message(ca, buf2, rmsg)
    assert read_ram_pcd_message(ca, io.BytesIO(buf2.getvalue())) == rmsg


def test_binary_montgomery_bytes_first_principles():
    """Spec-derived cross-check of the BINARY_OUTPUT+MONTGOMERY_OUTPUT
    element encoding (VERDICT r3 item 8). The libff submodule is empty,
    so the byte layout is derived from first principles instead of
    self-round-trips: GMP's mp_limb_t is 64-bit little-endian on
    x86-64, bigint<n>::data is a least-significant-limb-first array
    raw-written by BINARY_OUTPUT, and MONTGOMERY_OUTPUT streams
    mont_repr = v * 2^(64*n) mod p. The expected byte strings below are
    INDEPENDENTLY computed literals, not codec output."""
    import io
    from libsnark_tpu import get_curve
    from libsnark_tpu.serialization import Codec

    # (curve, limbs, R mod p, mont(2)) -- literals computed by hand
    vectors = {
        "alt_bn128": (4,
            0xe0a77c19a07df2f666ea36f7879462c0a78eb28f5c70b3dd35d438dc58f0d9d,
            0x1c14ef83340fbe5eccdd46def0f28c5814f1d651eb8e167ba6ba871b8b1e1b3a),
        "bls12_377": (6,
            0x8d6661e2fdf49a4cf495bf803c84e87b4e97b76e7c63059f7db3a98a7d3ff251409f837fffffb102cdffffffffff68,
            0x11accc3c5fbe93499e92b7f007909d0f69d2f6edcf8c60b3efb675314fa7fe4a2813f06ffffff62059bfffffffffed0),
        # 298-bit field: limb-granular width is 40 bytes, NOT
        # ceil(298/8) = 38 -- the case the old codec got wrong
        "mnt4": (5,
            0x1c1223d33c329184098647b5197c5df858728faab40e9de7a15e3b68df518c31a7b5863845c,
            0x382447a678652308130c8f6a32f8bbf0b0e51f55681d3bcf42bc76d1bea318634f6b0c708b8),
    }
    for name, (limbs, R_lit, mont2_lit) in vectors.items():
        curve = get_curve(name)
        codec = Codec(curve, mode="binary", montgomery=True)
        nbytes = 8 * limbs
        assert codec.q_bytes == nbytes, (name, codec.q_bytes)
        assert R_lit == pow(2, 64 * limbs, curve.q)      # literal sanity
        for v, mont in ((0, 0), (1, R_lit), (2, mont2_lit)):
            buf = io.BytesIO()
            codec.write_fq(buf, v)
            assert buf.getvalue() == mont.to_bytes(nbytes, "little"), \
                (name, v)
            buf.seek(0)
            assert codec.read_fq(buf) == v
        # non-Montgomery binary: plain little-endian value
        plain = Codec(curve, mode="binary", montgomery=False)
        buf = io.BytesIO()
        plain.write_fq(buf, 12345)
        assert buf.getvalue() == (12345).to_bytes(nbytes, "little")
