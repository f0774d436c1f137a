"""BCTV14-verifier-in-circuit test (reference
r1cs_ppzksnark_verifier_gadget tests, hardcoded-vk variant)."""
import pytest

from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.reductions.r1cs_to_qap import (
    qap_domain, qap_instance_map_with_evaluation)
from libsnark_tpu.proof_systems.bctv14 import (
    BCTV14VerificationKey, BCTV14Proof)
from libsnark_tpu.common.knowledge_commitment import KnowledgeCommitment
from libsnark_tpu.common.sparse_vector import AccumulationVector
from libsnark_tpu.ops.fp import FpKernel


def _trapdoor_bctv14(curve, cs, primary, aux, seed=77):
    """Build (vk, proof) host-side from the trusted-setup trapdoor."""
    import random
    rng = random.Random(seed)
    r = curve.r
    t, aA, aB, aC, rA, rB, beta, gamma = (rng.randrange(1, r)
                                          for _ in range(8))
    rC = rA * rB % r
    fr = FpKernel(curve.fr_params)
    domain = qap_domain(fr, curve.fr_params, cs)
    qap = qap_instance_map_with_evaluation(cs, domain, t)
    k, nv = cs.num_inputs, cs.num_variables
    full = [1] + [v % r for v in primary] + [v % r for v in aux]
    G1, G2 = curve.G1.one(), curve.G2.one()

    a_aux = sum(full[i] * qap.At[i] for i in range(k + 1, nv + 1)) % r
    a_full = sum(full[i] * qap.At[i] for i in range(nv + 1)) % r
    b_e = sum(full[i] * qap.Bt[i] for i in range(nv + 1)) % r
    c_e = sum(full[i] * qap.Ct[i] for i in range(nv + 1)) % r
    h_e = (a_full * b_e - c_e) * pow(qap.Zt, -1, r) % r
    k_e = beta * (rA * a_full + rB * b_e + rC * c_e) % r

    proof = BCTV14Proof(
        g_A=KnowledgeCommitment(G1 * (rA * a_aux % r),
                                G1 * (rA * aA * a_aux % r)),
        g_B=KnowledgeCommitment(G2 * (rB * b_e % r),
                                G1 * (rB * aB * b_e % r)),
        g_C=KnowledgeCommitment(G1 * (rC * c_e % r),
                                G1 * (rC * aC * c_e % r)),
        g_H=G1 * h_e,
        g_K=G1 * k_e)
    vk = BCTV14VerificationKey(
        alphaA_g2=G2 * aA, alphaB_g1=G1 * aB, alphaC_g2=G2 * aC,
        gamma_g2=G2 * gamma,
        gamma_beta_g1=G1 * (gamma * beta % r),
        gamma_beta_g2=G2 * (gamma * beta % r),
        rC_Z_g2=G2 * (rC * qap.Zt % r),
        encoded_IC_query=AccumulationVector.from_values(
            G1 * (rA * qap.At[0] % r),
            [G1 * (rA * qap.At[i] % r) for i in range(1, k + 1)]))
    return vk, proof


def test_trapdoor_bctv14_verifies_natively(bls377):
    from libsnark_tpu.proof_systems.bctv14 import BCTV14
    cs, primary, aux = generate_r1cs_example(bls377.r, 4, 1)
    vk, proof = _trapdoor_bctv14(bls377, cs, primary, aux)
    ps = BCTV14(bls377)
    assert ps.verifier_strong_IC(vk, primary, proof)
    assert not ps.verifier_strong_IC(vk, [(primary[0] + 1) % bls377.r],
                                     proof)


@pytest.mark.slow
def test_bctv14_verifier_gadget(bls377):
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
    from libsnark_tpu.gadgets.bctv14_verifier_gadget import (
        BCTV14VerifierGadget)

    cs, primary, aux = generate_r1cs_example(bls377.r, 4, 1)
    vk, proof = _trapdoor_bctv14(bls377, cs, primary, aux)

    pb = Protoboard(bls377.q)
    nbits = bls377.r.bit_length()
    bits = PBVariableArray().allocate(pb, nbits, "input_bits")
    gadget = BCTV14VerifierGadget(pb, bls377, vk, [list(bits)])
    bits.fill_with_bits_of_int(pb, primary[0] % bls377.r)
    gadget.set_proof_witness(proof)
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # flipped input bit must break a check
    pb.setval(bits[1], 1 - pb.val(bits[1]))
    gadget.generate_witness()
    assert pb.first_unsatisfied() is not None
