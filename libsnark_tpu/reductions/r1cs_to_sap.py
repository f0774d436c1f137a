"""R1CS -> SAP reduction (reference reductions/r1cs_to_sap/r1cs_to_sap.tcc).

Each R1CS constraint <a,x>*<b,x>=<c,x> becomes two square constraints
  (<a+b, x>)^2 = 4<c,x> + x'    and   (<a-b, x>)^2 = x'
with a fresh variable x' per constraint (tcc:80-117), plus input
consistency squares: x_0^2 = x_0 and, per input i >= 1,
  (x_i + x_0)^2 = 4 x_i + x''_i  and  (x_i - x_0)^2 = x''_i
(tcc:119-161). Domain size 2n + 2k + 1; SAP variables nv + n + k.

TPU re-design: the reduction rows are compiled once into device sparse
matrices (A_sap, C_sap over the EXTENDED variable set plus an AB-diff
matrix used to synthesize the extra witness values on device), so the
witness map (tcc:297-460) is batched matvec + NTT pipeline -- no
per-constraint host loop at prove time.
"""
from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
import jax.numpy as jnp

from ..ops.ntt import Radix2Domain, get_domain_size
from ..ops.domains import get_evaluation_domain, add_scaled_z
from ..relations.r1cs import SparseMatrix
from ..relations.arithmetic_programs import SAPInstanceEvaluation


def sap_domain(fr_kernel, fr_params, cs, force_pow_2: bool = False):
    """libfqfft-parity domain for min_size = 2n + 2k + 1
    (reference r1cs_to_sap.tcc domain selection)."""
    return get_evaluation_domain(
        fr_kernel, fr_params,
        2 * cs.num_constraints + 2 * cs.num_inputs + 1, force_pow_2)


def sap_num_variables(cs) -> int:
    return cs.num_variables + cs.num_constraints + cs.num_inputs


def _sap_rows(cs):
    """Yield (row, index, coeff) triples of the SAP A and C matrices, over
    the extended variable set [1, x_1..x_nv, x'_1..x'_n, x''_1..x''_k]."""
    p = cs.p
    n, k, nv = cs.num_constraints, cs.num_inputs, cs.num_variables
    extra_var = nv + 1             # x'_i at extra_var + i
    extra_var2 = nv + n            # x''_i at extra_var2 + i (i >= 1)
    A, C = [], []
    for i, con in enumerate(cs.constraints):
        for t in con.a.compact(p).terms:
            A.append((2 * i, t.index, t.coeff))
            A.append((2 * i + 1, t.index, t.coeff))
        for t in con.b.compact(p).terms:
            A.append((2 * i, t.index, t.coeff))
            A.append((2 * i + 1, t.index, (-t.coeff) % p))
        for t in con.c.compact(p).terms:
            C.append((2 * i, t.index, 4 * t.coeff % p))
        C.append((2 * i, extra_var + i, 1))
        C.append((2 * i + 1, extra_var + i, 1))
    off = 2 * n
    A.append((off, 0, 1))
    C.append((off, 0, 1))
    for i in range(1, k + 1):
        A.append((off + 2 * i - 1, i, 1))
        A.append((off + 2 * i - 1, 0, 1))
        C.append((off + 2 * i - 1, i, 4))
        C.append((off + 2 * i - 1, extra_var2 + i, 1))
        A.append((off + 2 * i, i, 1))
        A.append((off + 2 * i, 0, (-1) % p))
        C.append((off + 2 * i, extra_var2 + i, 1))
    return A, C


def sap_instance_map_with_evaluation(cs, domain, t: int):
    """Host-side SAP evaluation at secret t (tcc:178-266)."""
    p = cs.p
    nv_sap = sap_num_variables(cs)
    u = domain.lagrange_coeffs_at(t)
    At = [0] * (nv_sap + 1)
    Ct = [0] * (nv_sap + 1)
    rowsA, rowsC = _sap_rows(cs)
    for row, idx, coeff in rowsA:
        At[idx] = (At[idx] + coeff * u[row]) % p
    for row, idx, coeff in rowsC:
        Ct[idx] = (Ct[idx] + coeff * u[row]) % p
    Ht = [1] * (domain.m + 1)
    for i in range(1, domain.m + 1):
        Ht[i] = Ht[i - 1] * t % p
    return SAPInstanceEvaluation(
        t=t, At=At, Ct=Ct, Ht=Ht, Zt=domain.vanishing_eval(t),
        degree=domain.m, num_inputs=cs.num_inputs, num_variables=nv_sap)


@dataclasses.dataclass
class SAPDevice:
    """Device-compiled SAP: matrices over the extended variable set."""
    A: SparseMatrix            # (2n+2k+1) x (nv_sap+1)
    C: SparseMatrix
    AB_diff: SparseMatrix      # n x (nv+1): rows <a_i - b_i>
    num_constraints: int       # original R1CS n
    num_inputs: int
    num_variables: int         # original R1CS nv
    sap_num_variables: int
    p: int

    @classmethod
    def build(cls, cs, fk):
        p = cs.p
        n, k, nv = cs.num_constraints, cs.num_inputs, cs.num_variables
        nv_sap = sap_num_variables(cs)

        def mat(triples, num_rows, num_cols):
            if not triples:
                triples = [(0, 0, 0)]
            rows = np.asarray([t[0] for t in triples], np.int32)
            cols = np.asarray([t[1] for t in triples], np.int32)
            coefs = fk.encode([t[2] for t in triples])
            return SparseMatrix(rows=rows, cols=cols, coeffs=coefs,
                                num_rows=num_rows, num_cols=num_cols)

        rowsA, rowsC = _sap_rows(cs)
        diff = []
        for i, con in enumerate(cs.constraints):
            for t in con.a.compact(p).terms:
                diff.append((i, t.index, t.coeff))
            for t in con.b.compact(p).terms:
                diff.append((i, t.index, (-t.coeff) % p))
        return cls(A=mat(rowsA, 2 * n + 2 * k + 1, nv_sap + 1),
                   C=mat(rowsC, 2 * n + 2 * k + 1, nv_sap + 1),
                   AB_diff=mat(diff, max(n, 1), nv + 1),
                   num_constraints=n, num_inputs=k, num_variables=nv,
                   sap_num_variables=nv_sap, p=p)


def sap_extend_assignment(dev: SAPDevice, fk, assignment_mont):
    """[1, x] -> [1, x, (a_i-b_i|x)^2, (x_i-1)^2] on device (tcc:330-351)."""
    n, k = dev.num_constraints, dev.num_inputs
    d = dev.AB_diff.evaluate(fk, assignment_mont, max(n, 1))
    extra1 = fk.sqr(d)[..., :n]
    if k > 0:
        xi = assignment_mont[..., 1:k + 1]
        extra2 = fk.sqr(fk.sub(xi, fk.one(xi.shape[1:])))
        return jnp.concatenate([assignment_mont, extra1, extra2], axis=-1)
    return jnp.concatenate([assignment_mont, extra1], axis=-1)


def sap_witness_map(dev: SAPDevice, domain, sap_assign_mont, d1_m, d2_m):
    """Coefficients of H = (A^2 - C)/Z + (2 d1 A - d2 + d1^2 Z), device.

    d1_m/d2_m: (N, 1) Montgomery limb DEVICE operands (one compile per
    circuit shape, fresh randomness per proof). Returns (N, m+1)
    Montgomery limbs (reference tcc:297-466 pipeline: matvec, iFFT,
    ZK-patch, cosetFFT, square, subtract C coset, /Z, icosetFFT)."""
    fk = domain.fk
    m = domain.m
    aA = dev.A.evaluate(fk, sap_assign_mont, m)
    cA = domain.ifft(aA)
    two_d1 = fk.add(d1_m, d1_m)
    patch = fk.mul(cA, jnp.broadcast_to(two_d1, cA.shape))
    eA = domain.coset_fft(cA)
    H = fk.mul(eA, eA)
    aC = dev.C.evaluate(fk, sap_assign_mont, m)
    eC = domain.coset_fft(domain.ifft(aC))
    H = fk.sub(H, eC)
    Hc = domain.icoset_fft_divz(H)                  # (N, m)
    out = jnp.concatenate(
        [fk.add(Hc, patch), fk.zeros(Hc.shape[1:-1] + (1,))], axis=-1)
    # - d2 at coeff 0; += d1^2 * Z(x) (domain-shaped, sparse)
    d1sq = fk.mul(d1_m, d1_m)
    out = out.at[..., 0].set(fk.sub(out[..., 0], d2_m[..., 0]))
    return add_scaled_z(fk, domain, out, d1sq)
