"""In-circuit KZG10 evaluation verifier (reference gadgetlib1/gadgets/
verifiers/kzg10_verifier_gadget.hpp:63 -- a Clearmatics addition).

Verifies, inside a circuit over Fq(BLS12-377) = Fr(BW6-761), that a
KZG10 witness W proves phi(z) = v for a committed polynomial C:

    e(C - [v]_1, [1]_2) = e(W, [alpha - z]_2)

C, W are G1 variables; z, v are field variables; [alpha]_2 and the
generators are constants. [v]_1 and z*[1]_2 are variable-scalar
multiplications of constant bases (bit-decomposed double-and-add);
the right-hand pairing has a VARIABLE G2 operand, handled by the fully
symbolic Miller loop.
"""
from __future__ import annotations

from .protoboard import Gadget, Protoboard, PBVariable, PBVariableArray
from .basic import PackingGadget
from .fields_gadgets import _lc
from .pairing_gadgets import G1Gadgets, G2Gadgets, PairingGadgets


class KZG10VerifierGadget:
    """Constrains acceptance of (commitment, z, v, witness)."""

    def __init__(self, pb: Protoboard, inner_curve, srs_alpha_g2,
                 commitment, witness, z_bits, v_bits, prefix="kzg10v"):
        """srs_alpha_g2: host G2 constant [alpha]_2; commitment/witness:
        (x, y) G1 variable pairs; z_bits/v_bits: bit arrays (LSB-first)
        of the evaluation point and claimed value."""
        self.pb = pb
        self.curve = inner_curve
        self.pg = PairingGadgets(pb, inner_curve, prefix + ".pair")
        self.g1 = G1Gadgets(pb, prefix + ".g1")
        self.g2 = G2Gadgets(self.pg.fp2, prefix + ".g2")
        pg, g1, g2 = self.pg, self.g1, self.g2

        # [v]_1 = sum v_bits[j] 2^j G1 (constant-table double-and-add).
        # A fixed offset point R keeps every addition non-exceptional
        # (R never coincides with partial sums of 2^j G1 for nonzero v);
        # v = 0 / z = 0 are exceptional and excluded (the reference
        # curve gadgets carry the same non-degeneracy assumption).
        G1_one = inner_curve.G1.one()
        R_off = G1_one * 0xD15EA5EDC0FFEE
        acc = g1.const(R_off)
        T = G1_one
        for b in v_bits:
            acc = g1.conditional_add_const(acc, b, T)
            T = T + T
        v_g1 = g1.add(acc, g1.const(-R_off))    # remove offset

        # [z]_2 similarly over G2
        G2_one = inner_curve.G2.one()
        R2_off = G2_one * 0xFACEFEEDBEEF
        acc2 = g2.const(R2_off)
        T2 = G2_one
        for b in z_bits:
            acc2 = g2.conditional_add_const(acc2, b, T2)
            T2 = T2 + T2
        z_g2 = g2.add(acc2, g2.const(-R2_off))

        # A1 = C - [v]_1 ; S = [alpha]_2 - [z]_2
        A1 = g1.add(commitment, g1.neg(v_g1))
        S = g2.add(g2.const(srs_alpha_g2), g2.neg(z_g2))

        # e(A1, -[1]_2) * e(W, S) == 1
        f12 = pg.fp12
        f = pg.miller_loop_const_q(-G2_one, pg.embed_g1(A1))
        f = f12.mul(f, pg.miller_loop(pg.embed_g2(S), pg.embed_g1(witness)))
        out = pg.final_exp(f)
        f12.assert_eq(out, f12.one(), "kzg10_check")

    def generate_witness(self):
        self.g1.generate_witness()
        self.pg.generate_witness()
