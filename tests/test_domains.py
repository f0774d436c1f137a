"""Evaluation-domain selection parity (libfqfft basic/extended/step).

Reference behavior: reductions consume get_evaluation_domain(min_size)
(r1cs_to_qap.tcc:40-41); libfqfft picks basic_radix2 for powers of two,
step_radix2 for 2^k + 2^r, extended_radix2 past the field's two-adicity,
rounding min_size up to the nearest representable size otherwise.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.domains import (
    TwoPartDomain, get_evaluation_domain, _domain_shape)
from libsnark_tpu.ops.ntt import Radix2Domain


@pytest.fixture(scope="module")
def fr(bn254):
    return FpKernel(bn254.fr_params)


def test_domain_shape_selection(bn254):
    s = bn254.fr_params.two_adicity
    assert _domain_shape(16, s, False) == (4, -1)          # basic
    assert _domain_shape(33, s, False) == (5, 0)           # step 32+1
    assert _domain_shape(48, s, False) == (5, 4)           # step 32+16
    assert _domain_shape(43, s, False) == (5, 4)           # rounds to 48
    assert _domain_shape(7, s, False) == (3, -1)           # rounds to 8
    assert _domain_shape(33, s, True) == (6, -1)           # forced pow2
    # extended: just past the two-adicity limit
    assert _domain_shape(1 << (s + 1), s, False) == (s, s)
    with pytest.raises(ValueError):
        _domain_shape(1 << (s + 2), s, False)


def _naive_eval(coeffs, xs, p):
    out = []
    for x in xs:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        out.append(acc)
    return out


@pytest.mark.parametrize("logs", [(3, 0), (3, 2), (2, 2)])
def test_two_part_fft_matches_naive(bn254, fr, rng, logs):
    p = bn254.r
    dom = TwoPartDomain(fr, bn254.fr_params, *logs)
    m = dom.m
    coeffs = [rng.randrange(p) for _ in range(m)]
    a = jnp.asarray(fr.encode(coeffs))
    vals = fr.decode(dom.fft(a))
    expect = _naive_eval(coeffs, dom.domain_elements(), p)
    assert list(vals) == expect
    # interpolation inverts evaluation
    back = fr.decode(dom.ifft(jnp.asarray(fr.encode(expect))))
    assert list(back) == coeffs


@pytest.mark.parametrize("logs", [(3, 1), (2, 2)])
def test_two_part_coset_and_divz(bn254, fr, rng, logs):
    p = bn254.r
    dom = TwoPartDomain(fr, bn254.fr_params, *logs)
    m = dom.m
    g = dom.generator
    coeffs = [rng.randrange(p) for _ in range(m)]
    a = jnp.asarray(fr.encode(coeffs))
    vals = fr.decode(dom.coset_fft(a))
    expect = _naive_eval(coeffs, [g * x % p for x in dom.domain_elements()],
                         p)
    assert list(vals) == expect
    back = fr.decode(dom.icoset_fft(jnp.asarray(fr.encode(expect))))
    assert list(back) == coeffs
    # divide_by_z_on_coset: values / Z(g * x_i), Z nonzero off-domain
    dz = fr.decode(dom.divide_by_z_on_coset(jnp.asarray(fr.encode(expect))))
    for v, x, got in zip(expect, dom.domain_elements(), list(dz)):
        z = dom.vanishing_eval(g * x % p)
        assert z != 0
        assert got == v * pow(z, -1, p) % p


def test_two_part_lagrange_and_vanishing(bn254, fr, rng):
    p = bn254.r
    dom = TwoPartDomain(fr, bn254.fr_params, 3, 1)
    t = rng.randrange(p)
    L = dom.lagrange_coeffs_at(t)
    els = dom.domain_elements()
    # sum L_i(t) * f(x_i) == f(t) for a random poly of degree < m
    coeffs = [rng.randrange(p) for _ in range(dom.m)]
    fvals = _naive_eval(coeffs, els, p)
    ft = _naive_eval(coeffs, [t], p)[0]
    assert sum(l * v for l, v in zip(L, fvals)) % p == ft
    # Z vanishes exactly on the domain
    for x in els:
        assert dom.vanishing_eval(x) == 0
    assert dom.vanishing_eval(t) != 0 or t in els
    # indicator form when t is in the domain
    Lin = dom.lagrange_coeffs_at(els[3])
    assert Lin == [1 if i == 3 else 0 for i in range(dom.m)]


def test_two_part_add_poly_z(bn254, fr, rng):
    p = bn254.r
    for logs in ((3, 1), (2, 2)):
        dom = TwoPartDomain(fr, bn254.fr_params, *logs)
        H = jnp.asarray(fr.encode([0] * (dom.m + 1)))
        H = dom.add_poly_z(5, H)
        coeffs = [int(v) for v in fr.decode(H)]
        t = rng.randrange(p)
        lhs = _naive_eval(coeffs, [t], p)[0]
        assert lhs == 5 * dom.vanishing_eval(t) % p


def test_groth16_natural_domain_roundtrip(bn254):
    """Groth16 over a step-domain size (the reference default --
    force_pow_2_domain=false) proves and verifies; a corrupted proof is
    rejected."""
    from libsnark_tpu.relations.examples import generate_r1cs_example
    from libsnark_tpu.proof_systems.groth16 import Groth16
    from libsnark_tpu.reductions.r1cs_to_qap import qap_domain

    cs, primary, aux = generate_r1cs_example(bn254.r, 40, 2)
    g16 = Groth16(bn254)
    fr = g16.fr
    dom = qap_domain(fr, bn254.fr_params, cs)
    assert dom.m == 48 and isinstance(dom, TwoPartDomain)
    kp = g16.generator(cs, seed=7)
    proof = g16.prover(kp.pk, primary, aux, seed=8)
    assert g16.verifier_strong_IC(kp.vk, primary, proof)
    bad = type(proof)(g_A=proof.g_A, g_B=proof.g_B,
                      g_C=proof.g_C + bn254.G1.one())
    assert not g16.verifier_strong_IC(kp.vk, primary, bad)
