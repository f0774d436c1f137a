"""Multi-device sharding: 8-virtual-device CPU mesh (the reference has no
distributed runtime; this is new TPU-native surface per BASELINE.json)."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel
from libsnark_tpu.ops.ntt import Radix2Domain
from libsnark_tpu.ops.limbs import ints_to_limbs
from libsnark_tpu.parallel.msm_sharded import sharded_msm
from libsnark_tpu.parallel.ntt_sharded import FourStepDomain
from libsnark_tpu.curves.host_ec import multi_scalar_mul


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    return Mesh(devs, ("dp",))


@pytest.fixture(scope="module")
def bn():
    return get_curve("alt_bn128")


def test_sharded_msm_matches_host(bn, mesh):
    rng = random.Random(60)
    ck = CurveKernel(FpKernel(bn.fq_params), "G1")
    mk = MSMKernel(ck, bn.r.bit_length())
    m = 64  # 8 per device
    pts = [bn.G1.one() * rng.randrange(1, bn.r) for _ in range(m)]
    scalars = [rng.randrange(bn.r) for _ in range(m)]
    P_aff = ck.encode_points(pts, jacobian=False)
    sc = jnp.asarray(ints_to_limbs(scalars, 16))
    with mesh:
        out = sharded_msm(mk, mesh, "dp", P_aff, sc, c=5)
    got = ck.decode_points(out, bn.G1)[0]
    assert got == multi_scalar_mul(pts, scalars)


def test_four_step_ntt_matches_single(bn, mesh):
    rng = random.Random(61)
    fk = FpKernel(bn.fr_params)
    logm = 6
    ref = Radix2Domain(fk, bn.fr_params, logm)
    dist = FourStepDomain(fk, bn.fr_params, logm, mesh, "dp")
    m = 1 << logm
    vals = [rng.randrange(bn.r) for _ in range(m)]
    a = jnp.asarray(fk.encode(vals))
    with mesh:
        got = fk.decode(jax.jit(dist.fft)(a))
        rt = fk.decode(jax.jit(dist.ifft)(jax.jit(dist.fft)(a)))
    want = fk.decode(jax.jit(ref.fft)(a))
    assert [int(v) for v in got] == [int(v) for v in want]
    assert [int(v) for v in rt] == vals


def test_four_step_coset_roundtrip(bn, mesh):
    rng = random.Random(62)
    fk = FpKernel(bn.fr_params)
    dist = FourStepDomain(fk, bn.fr_params, 4, mesh, "dp")
    vals = [rng.randrange(bn.r) for _ in range(16)]
    a = jnp.asarray(fk.encode(vals))
    with mesh:
        back = fk.decode(dist.icoset_fft(dist.coset_fft(a)))
    assert [int(v) for v in back] == vals


@pytest.mark.slow
def test_prover_sharded_step_domain_pippenger(bn, mesh):
    """prover_sharded on the reference-DEFAULT natural domain (a step
    domain, r1cs_to_qap.tcc:40-41) with the PRODUCTION Pippenger MSM --
    the full multi-device prove path, not the compile-lean dryrun
    configuration (VERDICT r3 items 4/5)."""
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.proof_systems.groth16 import Groth16
    from libsnark_tpu.reductions.r1cs_to_qap import qap_domain
    from libsnark_tpu.ops.domains import TwoPartDomain

    nc = 37                      # min domain 40 = 32 + 8 -> step(5, 3)
    cs, primary, aux = generate_r1cs_example(bn.r, nc, 2)
    g16 = Groth16(bn)
    g16.host_keygen = True
    kp = g16.generator(cs, seed=3)
    base = qap_domain(g16.fr, bn.fr_params, cs)
    assert isinstance(base, TwoPartDomain) and base.kind == "step"
    proof = g16.prover_sharded(kp.pk, primary, aux, mesh, "dp", seed=4)
    assert g16.verifier_strong_IC(kp.vk, primary, proof)
    assert not g16.verifier_strong_IC(
        kp.vk, [(primary[0] + 1) % bn.r, primary[1]], proof)


def test_sharded_two_part_domain_matches_single(bn, mesh):
    """ShardedTwoPartDomain fft/ifft/coset round trip == the single-chip
    TwoPartDomain on a step domain (n1=16, n2=4; parts replicated --
    the transform must stay correct below the distribution threshold)."""
    from libsnark_tpu.ops.fp import FpKernel
    from libsnark_tpu.ops.domains import TwoPartDomain
    from libsnark_tpu.parallel.ntt_sharded import ShardedTwoPartDomain

    fk = FpKernel(bn.fr_params)
    ref = TwoPartDomain(fk, bn.fr_params, 4, 2)
    dist = ShardedTwoPartDomain(fk, bn.fr_params, 4, 2, mesh, "dp")
    rng = random.Random(5)
    vals = [rng.randrange(bn.r) for _ in range(ref.m)]
    a = jnp.asarray(fk.encode(vals))
    want = [int(v) for v in fk.decode(ref.fft(a))]
    with mesh:
        got = [int(v) for v in fk.decode(dist.fft(a))]
        back = fk.decode(dist.icoset_fft(dist.coset_fft(a)))
    assert got == want
    assert [int(v) for v in back] == vals
