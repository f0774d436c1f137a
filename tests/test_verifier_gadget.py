"""Groth16-verifier-in-circuit test (reference
test_r1cs_gg_ppzksnark_verifier_gadget.cpp, hardcoded-vk variant):
verify a BLS12-377 proof inside a circuit over Fr(BW6-761)."""
import pytest

from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.reductions.r1cs_to_qap import (
    qap_domain, qap_instance_map_with_evaluation)
from libsnark_tpu.proof_systems.groth16 import (
    Groth16VerificationKey, Groth16Proof)
from libsnark_tpu.ops.fp import FpKernel


def _trapdoor_groth16(curve, cs, primary, aux, seed=99):
    """Build (vk, proof) host-side from the trusted-setup trapdoor --
    a valid proof without running the device prover (test-only)."""
    import random
    rng = random.Random(seed)
    r = curve.r
    t, alpha, beta, gamma, delta, rr, ss = (
        rng.randrange(1, r) for _ in range(7))
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
    gamma_inv = pow(gamma, -1, r)
    vk = Groth16VerificationKey(
        alpha_g1=G1 * alpha, beta_g2=G2 * beta, gamma_g2=G2 * gamma,
        delta_g2=G2 * delta,
        gamma_ABC=[G1 * ((beta * qap.At[i] + alpha * qap.Bt[i] + qap.Ct[i])
                         * gamma_inv % r) for i in range(k + 1)])
    proof = Groth16Proof(g_A=G1 * A_e, g_B=G2 * B_e, g_C=G1 * C_e)
    return vk, proof


def test_trapdoor_proof_verifies_natively(bls377):
    from libsnark_tpu.proof_systems.groth16 import Groth16
    cs, primary, aux = generate_r1cs_example(bls377.r, 4, 1)
    vk, proof = _trapdoor_groth16(bls377, cs, primary, aux)
    g16 = Groth16(bls377)
    assert g16.verifier_strong_IC(vk, primary, proof)
    assert not g16.verifier_strong_IC(vk, [(primary[0] + 1) % bls377.r],
                                      proof)


@pytest.mark.slow
def test_groth16_verifier_gadget(bls377):
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
    from libsnark_tpu.gadgets.verifier_gadgets import Groth16VerifierGadget

    cs, primary, aux = generate_r1cs_example(bls377.r, 4, 1)
    vk, proof = _trapdoor_groth16(bls377, cs, primary, aux)

    pb = Protoboard(bls377.q)
    nbits = bls377.r.bit_length()
    bits = PBVariableArray().allocate(pb, nbits, "input_bits")
    gadget = Groth16VerifierGadget(pb, bls377, vk, [list(bits)])
    bits.fill_with_bits_of_int(pb, primary[0] % bls377.r)
    gadget.set_proof_witness(proof)
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # flip one input bit -> the pairing check must break
    pb.setval(bits[0], 1 - pb.val(bits[0]))
    gadget.generate_witness()      # recompute downstream witnesses
    assert pb.first_unsatisfied() is not None


@pytest.mark.slow
def test_groth16_verifier_gadget_rejects_off_curve_points(bls377):
    """Proof points are constrained on-curve (reference
    r1cs_gg_ppzksnark_verifier_gadget.tcc:54-61): witnessing an
    off-curve g_A or g_B must leave the circuit unsatisfiable even
    when the pairing equation would otherwise be consistent."""
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
    from libsnark_tpu.gadgets.verifier_gadgets import Groth16VerifierGadget

    cs, primary, aux = generate_r1cs_example(bls377.r, 4, 1)
    vk, proof = _trapdoor_groth16(bls377, cs, primary, aux)

    def build():
        pb = Protoboard(bls377.q)
        nbits = bls377.r.bit_length()
        bits = PBVariableArray().allocate(pb, nbits, "input_bits")
        gadget = Groth16VerifierGadget(pb, bls377, vk, [list(bits)])
        bits.fill_with_bits_of_int(pb, primary[0] % bls377.r)
        gadget.set_proof_witness(proof)
        return pb, gadget

    # off-curve g_A: bump y(A) off the curve equation
    pb, gadget = build()
    ya = gadget.proof_A[1].terms[0].index
    pb._values[ya] = (pb._values[ya] + 1) % pb.p
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is not None and "g16v_proof_g1_0" in str(bad), bad

    # off-curve g_B: bump one Fp2 coordinate of y(B)
    pb, gadget = build()
    yv = gadget._B_vars[1][0]
    pb.setval(yv, (pb.val(yv) + 1) % pb.p)
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is not None and "g16v_proof_g2_0" in str(bad), bad
