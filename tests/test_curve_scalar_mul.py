"""variable_or_identity / mul_by_scalar gadget family + membership
checks (reference gadgetlib1/gadgets/curves/scalar_multiplication.hpp
:35-342 and pairing/bw6_761_bls12_377/
bls12_377_membership_check_gadgets.hpp). Host-only protoboard tests."""
import pytest

from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariableArray
from libsnark_tpu.gadgets.pairing_gadgets import G1Gadgets, G2Gadgets
from libsnark_tpu.gadgets.fields_gadgets import Fp2Gadgets
from libsnark_tpu.gadgets.curve_scalar_mul import (
    G1Ops, G2Ops, ScalarMulGadgets)
from libsnark_tpu.gadgets.membership_gadgets import (
    G1MembershipCheckGadget, G2MembershipCheckGadget, psi_host,
    psi_constants)


NBITS = 16  # gadget is generic in bit length; small keeps tests fast


def _g1_mul_pb(curve, k, P_host):
    pb = Protoboard(curve.q)
    g1 = G1Gadgets(pb, "g1")
    ops = G1Ops(g1, curve)
    sm = ScalarMulGadgets(ops)
    P = g1.alloc(P_host)
    bits = PBVariableArray().allocate(pb, NBITS, "k")
    res = sm.mul_by_scalar(list(bits), P)
    bits.fill_with_bits_of_int(pb, k)
    g1.generate_witness()
    return pb, res


@pytest.mark.parametrize("k", [0, 1, 2, 3, 5, 0x89AB, (1 << NBITS) - 1])
def test_g1_mul_by_scalar(bls377, k):
    P_host = bls377.G1.one() * 7
    pb, res = _g1_mul_pb(bls377, k, P_host)
    bad = pb.first_unsatisfied()
    assert bad is None, bad
    if k == 0:
        assert pb.lc_val(res.is_id) == 1
    else:
        assert pb.lc_val(res.is_id) == 0
        expect = P_host * k
        assert pb.lc_val(res.pt[0]) == int(expect.x)
        assert pb.lc_val(res.pt[1]) == int(expect.y)


def test_g1_mul_by_const_scalar(bls377):
    P_host = bls377.G1.one() * 11
    pb = Protoboard(bls377.q)
    g1 = G1Gadgets(pb, "g1")
    sm = ScalarMulGadgets(G1Ops(g1, bls377))
    P = g1.alloc(P_host)
    out = sm.mul_by_const_scalar(0x1D3, P)
    g1.generate_witness()
    assert pb.first_unsatisfied() is None
    expect = P_host * 0x1D3
    assert pb.lc_val(out[0]) == int(expect.x)
    assert pb.lc_val(out[1]) == int(expect.y)


def test_g2_mul_by_scalar(bls377):
    Q_host = bls377.G2.one() * 9
    k = 0x2B7
    pb = Protoboard(bls377.q)
    fp2 = Fp2Gadgets(pb, int(bls377.Fq2.NON_RESIDUE), "fp2")
    g2 = G2Gadgets(fp2, "g2")
    ops = G2Ops(g2, bls377)
    sm = ScalarMulGadgets(ops)
    Q = ops.const(Q_host)  # constant base, variable scalar
    bits = PBVariableArray().allocate(pb, NBITS, "k")
    res = sm.mul_by_scalar(list(bits), Q)
    bits.fill_with_bits_of_int(pb, k)
    fp2.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad
    expect = Q_host * k
    assert pb.lc_val(res.pt[0][0]) == int(expect.x.c0)
    assert pb.lc_val(res.pt[0][1]) == int(expect.x.c1)
    assert pb.lc_val(res.pt[1][0]) == int(expect.y.c0)
    assert pb.lc_val(res.pt[1][1]) == int(expect.y.c1)


def test_psi_endomorphism_host(bls377):
    """psi is an endomorphism acting as multiplication by q on G2 --
    sanity for the in-circuit linear map."""
    Q = bls377.G2.one() * 5
    psiQ = psi_host(bls377, Q)
    # psi(Q) is on the curve and equals [q mod r] Q on the subgroup
    lam = bls377.q % bls377.r
    assert psiQ == Q * lam


def test_g1_membership_check(bls377):
    pb = Protoboard(bls377.q)
    g1 = G1Gadgets(pb, "g1")
    P_host = bls377.G1.one() * 0xDEED
    P = g1.alloc(P_host)
    gadget = G1MembershipCheckGadget(pb, bls377, g1, P)
    gadget.generate_witness(P_host)
    g1.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad

    # a wrong preimage witness must fail
    pb2 = Protoboard(bls377.q)
    g1b = G1Gadgets(pb2, "g1")
    Pb = g1b.alloc(P_host)
    gadget2 = G1MembershipCheckGadget(pb2, bls377, g1b, Pb)
    gadget2.generate_witness(P_host + bls377.G1.one())
    g1b.generate_witness()
    assert pb2.first_unsatisfied() is not None


def _curve_point_not_in_subgroup(curve, rng):
    """A point on the G2 twist NOT in the order-r subgroup (the G2
    cofactor is > 1, so random curve points are a.s. outside)."""
    F2 = curve.Fq2
    b2 = curve.b2
    while True:
        x = F2(rng.randrange(curve.q), rng.randrange(curve.q))
        rhs = x * x * x + b2
        y = _sqrt_fq2(curve, rhs, rng)
        if y is None:
            continue
        P = curve.G2.point(x, y)
        # __mul__ reduces mod r (always zero here); use the raw ladder
        if not P.mul_unreduced(curve.r).is_zero():
            return P


def _sqrt_fq2(curve, a, rng):
    """Square root in Fq2 by generic Tonelli-Shanks over the order
    q^2 - 1 group; returns None for non-residues."""
    q = curve.q
    order = q * q - 1
    if a.is_zero():
        return a
    if a ** (order // 2) != curve.Fq2.from_int(1):
        return None
    s, t = 0, order
    while t % 2 == 0:
        s, t = s + 1, t // 2
    # find a non-residue z
    while True:
        z = curve.Fq2(rng.randrange(q), rng.randrange(q))
        if not z.is_zero() and z ** (order // 2) != curve.Fq2.from_int(1):
            break
    M, c = s, z ** t
    u = a ** t
    R = a ** ((t + 1) // 2)
    one = curve.Fq2.from_int(1)
    while u != one:
        i, t2 = 0, u
        while t2 != one:
            t2 = t2 * t2
            i += 1
        b = c ** (1 << (M - i - 1))
        M, c = i, b * b
        u = u * c
        R = R * b
    return R


def test_g2_membership_check(bls377, rng):
    pb = Protoboard(bls377.q)
    fp2 = Fp2Gadgets(pb, int(bls377.Fq2.NON_RESIDUE), "fp2")
    g2 = G2Gadgets(fp2, "g2")
    Q_host = bls377.G2.one() * 0xFEED
    ops = G2Ops(g2, bls377)
    Q = ops.const(Q_host)
    G2MembershipCheckGadget(pb, bls377, g2, Q)
    fp2.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad


def test_g2_membership_check_rejects_non_subgroup(bls377, rng):
    """A curve point outside the order-r subgroup must not satisfy the
    psi-characteristic constraints."""
    h2 = bls377.g2_cofactor
    # construct an out-of-subgroup point from the full-group structure:
    # take S in the subgroup and add a nontrivial cofactor-order point
    # obtained from hashing... simplest reliable source: multiply an
    # arbitrary curve point by r -- if nonzero it has cofactor order.
    P = _curve_point_not_in_subgroup(bls377, rng)
    pb = Protoboard(bls377.q)
    fp2 = Fp2Gadgets(pb, int(bls377.Fq2.NON_RESIDUE), "fp2")
    g2 = G2Gadgets(fp2, "g2")
    ops = G2Ops(g2, bls377)
    Q = ops.const(P)
    G2MembershipCheckGadget(pb, bls377, g2, Q)
    try:
        fp2.generate_witness()
    except ValueError:
        return  # exceptional-case division: also a rejection
    assert pb.first_unsatisfied() is not None
