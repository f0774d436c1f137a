"""KZG10-verifier-in-circuit test (reference
gadgetlib1/gadgets/verifiers/kzg10_verifier_gadget + its test):
verify a BLS12-377 KZG opening inside a circuit over Fr(BW6-761).

Uses a trapdoor SRS (known alpha) so commitment/witness are host
scalar multiplications -- no device prover needed in the test."""
import pytest

from libsnark_tpu.polynomial_commitments.polynomial_ops import (
    poly_eval, poly_divide_by_linear, poly_sub)


def _trapdoor_kzg(curve, coeffs, z, alpha):
    """(C, v, W) from the trapdoor: C = [phi(alpha)]_1,
    W = [(phi(alpha)-phi(z))/(alpha-z)]_1."""
    r = curve.r
    phi_alpha = poly_eval(coeffs, alpha, r)
    v = poly_eval(coeffs, z, r)
    w_scalar = (phi_alpha - v) * pow(alpha - z, -1, r) % r
    return (curve.G1.one() * phi_alpha, v, curve.G1.one() * w_scalar)


def test_trapdoor_opening_verifies_natively(bls377):
    alpha, z = 0xA11CE, 0x5E1EC7
    coeffs = [5, 7, 11, 13]
    C, v, W = _trapdoor_kzg(bls377, coeffs, z, alpha)
    # native check: e(C - [v], [1]_2) == e(W, [alpha - z]_2)
    S = bls377.G2.one() * ((alpha - z) % bls377.r)
    lhs = C - bls377.G1.one() * v
    assert bls377.pairing_check([(lhs, -bls377.G2.one()), (W, S)])


@pytest.mark.slow
def test_kzg10_verifier_gadget(bls377):
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
    from libsnark_tpu.gadgets.pairing_gadgets import G1Gadgets
    from libsnark_tpu.gadgets.kzg10_verifier_gadget import KZG10VerifierGadget

    alpha, z = 0xA11CE, 0x5E1EC7
    coeffs = [5, 7, 11, 13]
    C, v, W = _trapdoor_kzg(bls377, coeffs, z, alpha)
    alpha_g2 = bls377.G2.one() * alpha

    pb = Protoboard(bls377.q)
    g1 = G1Gadgets(pb, "in")
    C_var = g1.alloc(C)
    W_var = g1.alloc(W)
    nbits = bls377.r.bit_length()
    z_bits = PBVariableArray().allocate(pb, nbits, "z")
    v_bits = PBVariableArray().allocate(pb, nbits, "v")
    gadget = KZG10VerifierGadget(pb, bls377, alpha_g2, C_var, W_var,
                                 list(z_bits), list(v_bits))
    gadget.assert_accept()
    z_bits.fill_with_bits_of_int(pb, z)
    v_bits.fill_with_bits_of_int(pb, v)
    g1.generate_witness()
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad
    assert pb.lc_val(gadget.result) == 1

    # wrong claimed value must break the check (result pinned to 1)
    v_bits.fill_with_bits_of_int(pb, v + 1)
    g1.generate_witness()
    gadget.generate_witness()
    assert pb.first_unsatisfied() is not None


@pytest.mark.slow
def test_kzg10_verifier_gadget_zero_eval(bls377):
    """v = 0 (polynomial with a root at z): no longer an unsatisfiable
    slope constraint -- the gadget stays satisfiable and conservatively
    reports result = 0, matching the reference's identity gating
    (kzg10_verifier_gadget.hpp:110-119)."""
    from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
    from libsnark_tpu.gadgets.pairing_gadgets import G1Gadgets
    from libsnark_tpu.gadgets.kzg10_verifier_gadget import KZG10VerifierGadget

    alpha, z = 0xA11CE, 0x5E1EC7
    r = bls377.r
    # phi(x) = (x - z) * (x + 3)  ->  phi(z) = 0
    coeffs = [(-z * 3) % r, (3 - z) % r, 1]
    C, v, W = _trapdoor_kzg(bls377, coeffs, z, alpha)
    assert v == 0
    alpha_g2 = bls377.G2.one() * alpha

    pb = Protoboard(bls377.q)
    g1 = G1Gadgets(pb, "in")
    C_var = g1.alloc(C)
    W_var = g1.alloc(W)
    nbits = bls377.r.bit_length()
    z_bits = PBVariableArray().allocate(pb, nbits, "z")
    v_bits = PBVariableArray().allocate(pb, nbits, "v")
    gadget = KZG10VerifierGadget(pb, bls377, alpha_g2, C_var, W_var,
                                 list(z_bits), list(v_bits))
    z_bits.fill_with_bits_of_int(pb, z)
    v_bits.fill_with_bits_of_int(pb, 0)
    g1.generate_witness()
    gadget.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad
    assert pb.lc_val(gadget.result) == 0
