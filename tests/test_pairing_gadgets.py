"""In-circuit BLS12-377 pairing vs the host engine (reference:
gadgetlib1/tests/test_bls12_377_pairing.cpp pattern)."""
import pytest

from libsnark_tpu.gadgets.protoboard import Protoboard, PBVariable
from libsnark_tpu.gadgets.pairing_gadgets import G1Gadgets, PairingGadgets


def test_g1_gadget_arithmetic(bls377):
    pb = Protoboard(bls377.q)
    g1 = G1Gadgets(pb)
    P_host = bls377.G1.one() * 5
    Q_host = bls377.G1.one() * 9
    P = g1.alloc(P_host)
    Q = g1.alloc(Q_host)
    S = g1.add(P, Q)
    D = g1.dbl(P)
    bit = PBVariable().allocate(pb, "bit")
    pb.setval(bit, 1)
    C = g1.conditional_add_const(S, bit, bls377.G1.one() * 3)
    g1.generate_witness()
    assert pb.is_satisfied()
    exp_S = P_host + Q_host
    exp_D = P_host + P_host
    exp_C = exp_S + bls377.G1.one() * 3
    assert pb.lc_val(S[0]) == int(exp_S.x) and pb.lc_val(S[1]) == int(exp_S.y)
    assert pb.lc_val(D[0]) == int(exp_D.x)
    assert pb.lc_val(C[0]) == int(exp_C.x)


@pytest.mark.slow
def test_miller_loop_gadget_vs_host(bls377):
    pb = Protoboard(bls377.q)
    pg = PairingGadgets(pb, bls377)
    g1 = G1Gadgets(pb)
    P_host = bls377.G1.one() * 7
    Q_host = bls377.G2.one() * 11
    P = g1.alloc(P_host)
    Qx, _ = pg.fp2.alloc_input(Q_host.x)
    Qy, _ = pg.fp2.alloc_input(Q_host.y)
    embQ = pg.embed_g2((Qx, Qy))
    f = pg.miller_loop(embQ, pg.embed_g1(P))
    pg.generate_witness()
    g1.generate_witness()
    eng = bls377.pairing_engine
    f_host = eng.miller_loop(eng.embed_g2(Q_host), eng.embed_g1(P_host))
    assert pg.fp12.eval(f) == f_host
    assert pb.is_satisfied()


@pytest.mark.slow
def test_pairing_product_check_gadget(bls377):
    """e(2G1, 3G2) * e(-6G1, G2) == 1 in-circuit."""
    pb = Protoboard(bls377.q)
    pg = PairingGadgets(pb, bls377)
    g1 = G1Gadgets(pb)
    A = g1.alloc(bls377.G1.one() * 2)
    B_host = bls377.G2.one() * 3
    C = g1.alloc(-(bls377.G1.one() * 6))
    D_host = bls377.G2.one()

    def embed_const_g2(Q):
        return pg.embed_g2((pg.fp2.const(Q.x), pg.fp2.const(Q.y)))

    pg.assert_pairing_product_one([
        (A, embed_const_g2(B_host)),
        (C, embed_const_g2(D_host)),
    ])
    pg.generate_witness()
    g1.generate_witness()
    bad = pb.first_unsatisfied()
    assert bad is None, bad
