"""Batched Jacobian EC kernels vs the host oracle."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.fp2 import Fp2Kernel
from libsnark_tpu.ops.ec import CurveKernel


def make_kernels(curve):
    fq = FpKernel(curve.fq_params)
    g1 = CurveKernel(fq, f"{curve.name}.G1")
    beta = int(curve.Fq2.NON_RESIDUE)
    fq2 = Fp2Kernel(fq, beta)
    g2 = CurveKernel(fq2, f"{curve.name}.G2")
    return g1, g2


@pytest.fixture(scope="module")
def bn():
    return get_curve("alt_bn128")


def host_points(curve, group, rng, n):
    pts = [group.one() * rng.randrange(1, curve.r) for _ in range(n - 2)]
    return pts + [group.zero(), group.one()]


@pytest.mark.parametrize("which", ["g1", "g2"])
def test_add_dbl_parity(bn, which):
    rng = random.Random(20)
    curve = bn
    g1k, g2k = make_kernels(curve)
    ck, grp = (g1k, curve.G1) if which == "g1" else (g2k, curve.G2)
    B = 10
    P_host = host_points(curve, grp, rng, B)
    Q_host = host_points(curve, grp, rng, B)
    # include edge lanes: P==Q, P==-Q
    Q_host[0] = P_host[0]
    Q_host[1] = -P_host[1]
    P = ck.encode_points(P_host)
    Q = ck.encode_points(Q_host)

    add = jax.jit(ck.add)(P, Q)
    got = ck.decode_points(add, grp)
    want = [p + q for p, q in zip(P_host, Q_host)]
    assert got == want

    dbl = jax.jit(ck.dbl)(P)
    got = ck.decode_points(dbl, grp)
    want = [p.dbl() for p in P_host]
    assert got == want


def test_mixed_add_parity(bn):
    rng = random.Random(21)
    curve = bn
    ck, grp = make_kernels(curve)[0], curve.G1
    B = 10
    P_host = host_points(curve, grp, rng, B)
    Q_host = host_points(curve, grp, rng, B)
    Q_host[0] = P_host[0]           # doubling lane
    Q_host[1] = -P_host[1]          # cancellation lane
    P = ck.encode_points(P_host)
    Qa = ck.encode_points(Q_host, jacobian=False)
    out = jax.jit(ck.madd)(P, Qa)
    got = ck.decode_points(out, grp)
    want = [p + q for p, q in zip(P_host, Q_host)]
    assert got == want


def test_scalar_mul_const(bn):
    rng = random.Random(22)
    curve = bn
    ck, grp = make_kernels(curve)[0], curve.G1
    P_host = host_points(curve, grp, rng, 4)
    P = ck.encode_points(P_host)
    k = rng.randrange(1, 1 << 64)
    out = jax.jit(lambda p: ck.scalar_mul_const(p, k))(P)
    got = ck.decode_points(out, grp)
    want = [p * k for p in P_host]
    assert got == want
