"""R1CS -> QAP reduction (reference reductions/r1cs_to_qap/r1cs_to_qap.tcc).

Two halves, matching how the reference splits work between setup and prove:

* ``qap_instance_map_with_evaluation`` (tcc:106-175): evaluate the QAP at a
  secret point t. Runs at setup time, host-side (python ints) -- O(nnz + m)
  modular ops, once per circuit.

* ``qap_witness_map`` (tcc:209-344): THE prover hot path. 2 sparse matvecs
  + input-consistency rows, 3 iFFTs, 3 coset FFTs, pointwise multiply,
  divide-by-Z, 1 icosetFFT -- all as batched device kernels over (N, m)
  Montgomery limb arrays.

Domain size = num_constraints + num_inputs + 1 (rounded up to a power of
two), the extra rows being the per-input consistency constraints the
reference scatters at tcc:50-76 and tcc:229-248.
"""
from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp

from ..ops.ntt import Radix2Domain, get_domain_size
from ..ops.domains import get_evaluation_domain


def qap_domain(fr_kernel, fr_params, cs, force_pow_2: bool = False):
    """Select the evaluation domain for min_size = n + k + 1 via the
    libfqfft-parity chooser (basic/extended/step radix-2); force_pow_2
    mirrors the reference's force_pow_2_domain option
    (r1cs_gg_ppzksnark.hpp:386)."""
    return get_evaluation_domain(
        fr_kernel, fr_params, cs.num_constraints + cs.num_inputs + 1,
        force_pow_2)


@dataclasses.dataclass
class QAPInstanceEvaluation:
    """A_i(t), B_i(t), C_i(t), t^i, Z(t) -- host ints."""
    t: int
    At: List[int]
    Bt: List[int]
    Ct: List[int]
    Ht: List[int]     # powers t^0 .. t^m
    Zt: int
    degree: int
    num_inputs: int
    num_variables: int


def qap_instance_map_with_evaluation(cs, domain, t: int):
    p = cs.p
    nv = cs.num_variables
    u = domain.lagrange_coeffs_at(t)
    At = [0] * (nv + 1)
    Bt = [0] * (nv + 1)
    Ct = [0] * (nv + 1)
    # input consistency: A_i(t) += L_{n + i}(t) for i = 0..num_inputs
    for i in range(cs.num_inputs + 1):
        At[i] = u[cs.num_constraints + i]
    for j, con in enumerate(cs.constraints):
        uj = u[j]
        for term in con.a.compact(p).terms:
            At[term.index] = (At[term.index] + term.coeff * uj) % p
        for term in con.b.compact(p).terms:
            Bt[term.index] = (Bt[term.index] + term.coeff * uj) % p
        for term in con.c.compact(p).terms:
            Ct[term.index] = (Ct[term.index] + term.coeff * uj) % p
    Ht = [1] * (domain.m + 1)
    for i in range(1, domain.m + 1):
        Ht[i] = Ht[i - 1] * t % p
    return QAPInstanceEvaluation(
        t=t, At=At, Bt=Bt, Ct=Ct, Ht=Ht, Zt=domain.vanishing_eval(t),
        degree=domain.m, num_inputs=cs.num_inputs, num_variables=nv)


def qap_witness_map(r1cs_dev, domain, assignment_mont, dev_arrs=None,
                    dt=None):
    """Compute coefficients of H(x) = (A(x)B(x) - C(x)) / Z(x) on device.

    r1cs_dev: R1CSDevice; assignment_mont: (N, num_vars+1) Montgomery limbs
    with the constant 1 at index 0. Returns (N, m) Montgomery coefficients
    (degree <= m-2: the last column is zero).

    dev_arrs / dt: optional jit-argument pytrees
    (R1CSDevice.device_arrays() / Radix2Domain.device_tables()) -- with
    them the large integer tables enter the executable as PARAMETERS,
    not inline literals (the 2^20 literal HLO overflows the compile
    service's request limit).
    """
    fk = domain.fk
    m = domain.m
    n = r1cs_dev.num_constraints
    k = r1cs_dev.num_inputs
    da = dev_arrs or {}

    aA = r1cs_dev.A.evaluate(fk, assignment_mont, m, da.get("A"))
    aB = r1cs_dev.B.evaluate(fk, assignment_mont, m, da.get("B"))
    aC = r1cs_dev.C.evaluate(fk, assignment_mont, m, da.get("C"))
    # input consistency rows: aA[n + i] = s_i for i = 0..k
    aA = jnp.concatenate(
        [aA[..., :n], assignment_mont[..., :k + 1], aA[..., n + k + 1:]],
        axis=-1)

    # A/B/C ride ONE stacked transform (compile-lean: one ifft + one
    # cosetFFT call site instead of three of each)
    S = jnp.stack([aA, aB, aC], axis=-2)          # (N, 3, m)
    eS = domain.coset_fft(domain.ifft(S, dt), dt=dt)
    H = fk.sub(fk.mul(eS[..., 0, :], eS[..., 1, :]), eS[..., 2, :])
    return domain.icoset_fft_divz(H, dt=dt)


def qap_witness_map_zk(r1cs_dev, domain, assignment_mont, d1_m, d2_m, d3_m):
    """ZK-patched witness map (reference r1cs_to_qap.tcc:209-344 with
    nonzero d1/d2/d3): coefficients of

      H = (A*B - C)/Z + (d2*A + d1*B - d3) + d1*d2*Z

    d1_m/d2_m/d3_m: (N, 1) Montgomery limb arrays -- DEVICE OPERANDS, so
    the surrounding jit compiles once and every proof reuses the
    executable with fresh randomness. Returns (N, m+1) Montgomery limbs
    (degree m; top coeff = d1*d2). Used by BCTV14/ADSNARK; Groth16
    passes zeros via ``qap_witness_map``."""
    fk = domain.fk
    m = domain.m
    n = r1cs_dev.num_constraints
    k = r1cs_dev.num_inputs

    aA = r1cs_dev.A.evaluate(fk, assignment_mont, m)
    aB = r1cs_dev.B.evaluate(fk, assignment_mont, m)
    aA = jnp.concatenate(
        [aA[..., :n], assignment_mont[..., :k + 1], aA[..., n + k + 1:]],
        axis=-1)
    cA = domain.ifft(aA)
    cB = domain.ifft(aB)
    bcast = lambda d, ref: jnp.broadcast_to(d, ref.shape)
    patch = fk.add(fk.mul(cA, bcast(d2_m, cA)), fk.mul(cB, bcast(d1_m, cB)))
    eA = domain.coset_fft(cA)
    eB = domain.coset_fft(cB)
    H = fk.mul(eA, eB)
    aC = r1cs_dev.C.evaluate(fk, assignment_mont, m)
    eC = domain.coset_fft(domain.ifft(aC))
    H = fk.sub(H, eC)
    Hc = domain.icoset_fft_divz(H)
    out = jnp.concatenate(
        [fk.add(Hc, patch), fk.zeros(Hc.shape[1:-1] + (1,))], axis=-1)
    d1d2 = fk.mul(d1_m, d2_m)                      # (N, 1)
    # += d1*d2 * Z(x) (sparse; Z is domain-shaped -- x^m - 1 only for
    # the basic radix-2 domain) and -= d3 at the constant term
    from ..ops.domains import add_scaled_z
    out = out.at[..., 0].set(fk.sub(out[..., 0], d3_m[..., 0]))
    return add_scaled_z(fk, domain, out, d1d2)
