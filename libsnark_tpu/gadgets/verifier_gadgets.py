"""In-circuit Groth16 verifier (reference gadgetlib1/gadgets/verifiers/
r1cs_gg_ppzksnark_verifier_gadget.hpp:30-176, the recursion enabler).

Verifies a BLS12-377 Groth16 proof inside a circuit over
Fq(BLS12-377) = Fr(BW6-761): the "hardcoded vk" variant (vk elements
are circuit constants; the reference ships both variable-vk and
hardcoded-vk verifier gadgets -- the hardcoded one is what one-layer
composition uses).

Check: e(A, B) = e(alpha, beta) * e(acc, gamma) * e(C, delta)
  * e(alpha, beta): a constant GT factor folded in linearly
  * e(acc, gamma), e(C, delta): constant-Q Miller loops (linear lines)
  * e(A, B): the one fully-symbolic Miller loop
  * acc: IC accumulation over the public-input BITS with precomputed
    2^j * IC_i constant tables
"""
from __future__ import annotations

from typing import List

from .protoboard import Gadget, Protoboard, PBVariable, PBVariableArray
from .basic import generate_boolean_r1cs_constraint
from .fields_gadgets import _lc
from .pairing_gadgets import G1Gadgets, PairingGadgets


class Groth16VerifierGadget:
    """Hardcoded-vk Groth16 verifier over the inner curve."""

    def __init__(self, pb: Protoboard, inner_curve, vk,
                 input_bits: List[list], prefix="g16v"):
        """vk: proof_systems.groth16.Groth16VerificationKey (host points);
        input_bits[i] = bit array (LSB first) of public input i.
        Proof variables are allocated here; fill them with
        set_proof_witness(proof) before generate_witness()."""
        self.pb = pb
        self.curve = inner_curve
        self.vk = vk
        self.pg = PairingGadgets(pb, inner_curve, prefix + ".pair")
        self.g1 = G1Gadgets(pb, prefix + ".g1")
        self.input_bits = input_bits
        self.proof_A = self.g1.alloc()
        self.proof_C = self.g1.alloc()
        Bx, self._Bx_vars = self.pg.fp2.alloc_input()
        By, self._By_vars = self.pg.fp2.alloc_input()
        self.proof_B = (Bx, By)
        self._build()

    def set_proof_witness(self, proof):
        pb = self.pb
        # proof_A/C are single-variable LCs
        for (lc_pair, pt) in ((self.proof_A, proof.g_A),
                              (self.proof_C, proof.g_C)):
            pb._values[lc_pair[0].terms[0].index] = int(pt.x) % pb.p
            pb._values[lc_pair[1].terms[0].index] = int(pt.y) % pb.p
        pb.setval(self._Bx_vars[0], int(proof.g_B.x.c0))
        pb.setval(self._Bx_vars[1], int(proof.g_B.x.c1))
        pb.setval(self._By_vars[0], int(proof.g_B.y.c0))
        pb.setval(self._By_vars[1], int(proof.g_B.y.c1))

    def _build(self):
        pg, g1, pb = self.pg, self.g1, self.pb
        f12 = pg.fp12
        vk = self.vk
        curve = self.curve
        eng = curve.pairing_engine

        for bits in self.input_bits:
            for b in bits:
                generate_boolean_r1cs_constraint(pb, b, "g16v_input_bit")

        # ---- acc = IC[0] + sum_i sum_j bit_{i,j} 2^j IC[i+1] ---------------
        acc = g1.const(vk.gamma_ABC[0])
        for i, bits in enumerate(self.input_bits):
            base = vk.gamma_ABC[i + 1]
            T = base
            for j, bit in enumerate(bits):
                acc = g1.conditional_add_const(acc, bit, T)
                T = T + T
        self.acc = acc

        # ---- pairing product -------------------------------------------------
        # f = ML(B, A) * [const e_ml(-alpha, beta)] * ML_gamma(-acc)
        #     * ML_delta(-C); FE(f) == 1
        embA = pg.embed_g1(self.proof_A)
        embB = pg.embed_g2(self.proof_B)
        f = pg.miller_loop(embB, embA)
        const_ml = eng.miller_loop(eng.embed_g2(vk.beta_g2),
                                   eng.embed_g1(-vk.alpha_g1))
        f = pg.mul_const12(f, const_ml)
        f = f12.mul(f, pg.miller_loop_const_q(
            vk.gamma_g2, pg.embed_g1(g1.neg(acc))))
        f = f12.mul(f, pg.miller_loop_const_q(
            vk.delta_g2, pg.embed_g1(g1.neg(self.proof_C))))
        out = pg.final_exp(f)
        f12.assert_eq(out, f12.one(), "g16v_check")

    def generate_witness(self):
        """Run after set_proof_witness() and input bits are set."""
        self.g1.generate_witness()
        self.pg.generate_witness()
