"""Device-kernel + proof-system coverage for the MNT cycle curves:
generic-a Jacobian EC kernels (ops/ec.py dbl-2007-bl path), the Fp3
G2 kernel (MNT6 quadratic twist over Fq3), and full Groth16 round trips
over both curves (base.py PairingSystem wiring).

Compile-heavy (new 19-limb shapes) — slow-marked; the full round trips
were validated on this box (see STATUS.md round-2 MNT section).
"""
import pytest

from libsnark_tpu.curves import get_curve


@pytest.mark.slow
@pytest.mark.parametrize("name", ["mnt4", "mnt6", "edwards"])
def test_device_scalar_mul_matches_host(name):
    from libsnark_tpu.proof_systems.base import PairingSystem
    c = get_curve(name)
    ps = PairingSystem(c)
    P = ps.g1.encode_points([c.G1.one()])
    got = ps.g1.decode_points(ps.g1.scalar_mul_const(P, 37), c.G1)[0]
    assert got == c.G1.one() * 37
    Q = ps.g2.encode_points([c.G2.one()])
    got2 = ps.g2.decode_points(ps.g2.scalar_mul_const(Q, 91), c.G2)[0]
    assert got2 == c.G2.one() * 91


@pytest.mark.slow
@pytest.mark.parametrize("name", ["mnt4", "mnt6", "edwards"])
def test_groth16_roundtrip_mnt(name):
    """Device keygen + prove + host verify over a cycle curve
    (including the G2-over-Fq3 MSM on mnt6)."""
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.proof_systems.groth16 import Groth16
    c = get_curve(name)
    cs, primary, aux = generate_r1cs_example(c.r, 8, 1)
    g16 = Groth16(c)
    kp = g16.generator(cs, seed=3)
    proof = g16.prover(kp.pk, primary, aux, seed=4)
    assert g16.verifier_strong_IC(kp.vk, primary, proof)
    assert not g16.verifier_strong_IC(kp.vk, [(primary[0] + 1) % c.r],
                                      proof)
