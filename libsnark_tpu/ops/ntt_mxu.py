"""MXU-native NTT: DFT steps as int8 systolic-array matmuls.

The radix-2 stage loop in ops/ntt.py is VPU-bound: log2(n) stages of
(mul + add + sub) over the whole array ~= 48 scan kernels of u32 lane
work for n = 2^16. On TPU the FLOPs belong on the MXU. This module
re-casts the transform as recursive four-step Cooley-Tukey with radix
16 (Bailey decomposition; libfqfft has no analogue -- this design is
TPU-first), where each radix-R DFT is ONE shared integer matmul:

  * Field elements (Montgomery form, 16-bit limbs) are split into 4-bit
    nibbles; multiplication by the CONSTANT DFT matrix W_R[k,j] = w^(jk)
    is linear over the nibbles, so the whole "sum of field products" is
    a single (TO*R, 4N*R) x (4N*R, batch) int8 matmul with int32
    accumulation -- exact (max column 225*4N*R < 2^24) and MXU-native.
    A bf16/f32 variant is provided for backends without int8 matmul
    units (also exact under the same bound).
  * A second small "fold" matmul compresses each stage's wide result
    (2D nibble columns) back to D nibbles mod p, and the per-level
    twiddle multiply doubles as the reduction to canonical form:
    FpKernel.mul_wide against the PLAIN twiddle table runs an
    (N+2)-step Montgomery scan -- one short VPU pass per level instead
    of log2(n) full passes.
  * All accumulated 2^(-16*(N+2)) Montgomery factors (one per level)
    are cancelled by a single final constant, which also absorbs 1/m
    for the inverse transform and any coset/divide-by-Z scalars.

Behavioral parity target: libfqfft basic_radix2_domain FFT/iFFT
(_basic_radix2_FFT, libfqfft/evaluation_domain/domains/
basic_radix2_domain_aux.tcc) -- same natural-order DFT semantics,
entirely different algorithm/hardware mapping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import ints_to_limbs

U32 = jnp.uint32


def _dft_digit_matrix(p: int, w: int, R: int, N: int,
                      ldiag=None, rdiag=None) -> np.ndarray:
    """Nibble-expanded DFT matrix for radix R, root w (order R) mod p.

    Returns AM (TO*R, D*R) uint8 with D = 4N input nibbles per element
    and TO = 2*D output nibble positions:
      AM[t*R + k, d*R + j] = nibble_{t-d}( ldiag[k] * w^(jk) * rdiag[j] )
    so that for canonical inputs v_j = sum_d nib[d,j] 2^(4d):
      out[t, k] = sum_{d,j} AM[tR+k, dR+j] * nib[d, j]
                = nibble-column t of  sum_j W[k,j] * v_j  (exact).
    ldiag/rdiag (length-R plain ints) fold coset scalings into the
    matrix for free.
    """
    D = 4 * N
    TO = 2 * D
    W = np.zeros((R, R), dtype=object)
    for k in range(R):
        for j in range(R):
            v = pow(w, (j * k) % R, p)
            if ldiag is not None:
                v = v * ldiag[k] % p
            if rdiag is not None:
                v = v * rdiag[j] % p
            W[k, j] = v
    # nibble planes of W: (D, R, R)
    nib = np.zeros((D, R, R), dtype=np.uint8)
    for d in range(D):
        for k in range(R):
            for j in range(R):
                nib[d, k, j] = (W[k, j] >> (4 * d)) & 15
    AM = np.zeros((TO * R, D * R), dtype=np.uint8)
    t_idx = np.arange(TO)[:, None]          # (TO, 1)
    d_idx = np.arange(D)[None, :]           # (1, D)
    delta = t_idx - d_idx                   # (TO, D)
    ok = (delta >= 0) & (delta < D)
    for k in range(R):
        for j in range(R):
            block = np.zeros((TO, D), dtype=np.uint8)
            block[ok] = nib[delta[ok], k, j]
            AM[k::R, j::R] = block
    return AM


class MxDft:
    """DFT of size n = 2^logn over Fr via MXU digit matmuls.

    Drop-in for Radix2Domain._fft_core semantics (natural order in/out,
    Y[k] = sum_j x[j] w^(jk), Montgomery limbs in and out). `scale` is
    an extra plain-int factor folded into the final correction (1/m for
    the inverse transform, coset constants, ...).
    """

    def __init__(self, fk, logn: int, omega: int, scale: int = 1,
                 dtype: str = "int8", coset_in: int = None,
                 coset_out: int = None):
        """coset_in=g folds the input scaling x[j] *= g^j into the DFT
        matrices (cosetFFT); coset_out=h folds the output scaling
        Y[k] *= h^k (icosetFFT's post-multiply). Both are free on the
        MXU: each level's matrix absorbs a diagonal factor."""
        self.fk = fk
        p = fk.p
        N = fk.N
        assert 4 + 2 * p.bit_length() <= 32 * N, \
            "wide product must fit 2N limbs"
        self.logn = logn
        self.n = 1 << logn
        self.dtype = dtype
        # level sizes: peel radix 16 until the leaf (<= 16)
        sizes = [self.n]
        while sizes[-1] > 16:
            sizes.append(sizes[-1] // 16)
        self.sizes = sizes
        # per-level OUTER-DFT matrices (radix 16, leaf for the last);
        # the order-R root is omega^(n/R) at every level. Coset
        # diagonals: level l's input index j1 carries g^(16^l * j1)
        # (g^j = prod_l g^(16^l * j1_l)); its output index k1 carries
        # h^((nl/16) * k1), with h^(k2) delegated to the child.
        self._AM_levels = []
        cache = {}
        for l, nl in enumerate(sizes):
            R = min(nl, 16)
            wR = pow(omega, self.n // R, p)
            ld = rd = None
            if coset_in is not None:
                gl = pow(coset_in, 16 ** l, p)
                rd = tuple(pow(gl, j, p) for j in range(R))
            if coset_out is not None:
                hl = coset_out if nl <= 16 else pow(coset_out, nl // 16, p)
                ld = tuple(pow(hl, k, p) for k in range(R))
            key = (R, wR, ld, rd)
            if key not in cache:
                cache[key] = _dft_digit_matrix(p, wR, R, N, ld, rd)
            self._AM_levels.append(cache[key])
        # per-level twiddle tables (plain ints): TW[j1, k2] = w_l^(j1*k2)
        # with w_l = omega^(n/nl); shared by all same-size subproblems
        self._tw = []
        for nl in sizes[:-1]:
            wl = pow(omega, self.n // nl, p)
            n2 = nl // 16
            vals = [pow(wl, (j1 * k2), p)
                    for j1 in range(16) for k2 in range(n2)]
            self._tw.append(
                np.asarray(ints_to_limbs(vals, N)).reshape(N, 16, n2))
        # fold matrix: a second small matmul compresses the 2D-nibble
        # matmul result (value < 2^18 * 2^(8N-ish)) back to D nibbles
        # (value < 2^18 * 2^(4D)), shrinking the per-level mul_wide
        # scan from 2N to N+2 limbs. F[d, t*5+s] = nib_d(2^(4(t+s)) % p)
        # -- each int32 nibble column splits into 5 four-bit planes.
        D = 4 * N
        TO = 2 * D
        F = np.zeros((D, TO * 5), dtype=np.uint8)
        for t in range(TO):
            for s in range(5):
                v = pow(2, 4 * (t + s), p)
                for d in range(D):
                    F[d, t * 5 + s] = (v >> (4 * d)) & 15
        self._fold = F
        self._wa = N + 2
        # final correction: cancel one 2^(-16*Wa) per level, apply scale
        S = len(sizes)
        c = pow(2, 16 * self._wa * S, p) * (scale % p) % p
        self._final = np.asarray(ints_to_limbs([c], N)).reshape(N, 1)

    # ------------------------------------------------------------- pytree
    def device_tables(self):
        """Tables as a jit-argument pytree (keeps big constants out of
        the HLO; same rationale as Radix2Domain.device_tables)."""
        uniq = {}
        for m in self._AM_levels:
            if id(m) not in uniq:
                uniq[id(m)] = jnp.asarray(m)
        return {
            "AM": tuple(uniq[id(m)] for m in self._AM_levels),
            "tw": tuple(jnp.asarray(t) for t in self._tw),
            "fold": jnp.asarray(self._fold),
            "final": jnp.asarray(self._final),
        }

    def _dot(self, M, x2):
        """Integer matmul in the configured exact dtype."""
        if self.dtype == "bf16":
            out = jax.lax.dot_general(
                M.astype(jnp.bfloat16), x2.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out.astype(jnp.int32)
        return jax.lax.dot_general(
            M.astype(jnp.int8), x2.astype(jnp.int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    # ------------------------------------------------------------ matmul
    def _matmul(self, v, AM, R: int):
        """One radix-R DFT along the LAST axis of v (canonical Montgomery
        limbs (N, *batch, R)) as a single digit matmul. Returns wide
        nibble columns (TO, *batch, R) int32."""
        N = self.fk.N
        D = 4 * N
        TO = 2 * D
        # nibble planes: d = 4*i + s
        ds = jnp.stack([(v >> (4 * s)) & 15 for s in range(4)], axis=1)
        ds = ds.reshape((D,) + v.shape[1:])          # (D, *batch, R)
        x = jnp.moveaxis(ds, -1, 1)                  # (D, R, *batch)
        batch = x.shape[2:]
        x2 = x.reshape(D * R, -1)                    # rows d*R + j
        out = self._dot(AM, x2)
        out = out.reshape((TO, R) + batch)           # rows t*R + k
        return jnp.moveaxis(out, 1, -1)              # (TO, *batch, R)

    def _mulw(self, dig, table, tables):
        """Wide nibble columns -> canonical Montgomery limbs, times the
        PLAIN-int table (twiddles or the final constant).

        The fold matmul first compresses the 2D nibble columns (< 2^20)
        to D nibbles (< 2^18) -- value preserved mod p -- so the CIOS
        scan runs N+2 steps instead of 2N."""
        fk = self.fk
        N = fk.N
        D = 4 * N
        TO = dig.shape[0]
        planes = jnp.stack([(dig >> (4 * s)) & 15 for s in range(5)],
                           axis=1)                   # (TO, 5, *batch)
        x2 = planes.reshape(TO * 5, -1)              # rows t*5 + s
        out = self._dot(tables["fold"], x2)          # (D, B)
        dig2 = out.reshape((D,) + dig.shape[1:])
        cols = dig2.astype(U32).reshape((N, 4) + dig.shape[1:])
        cols = (cols[:, 0] + (cols[:, 1] << 4)
                + (cols[:, 2] << 8) + (cols[:, 3] << 12))  # (N, *batch)
        wide = fk._carry_propagate(cols, out_len=self._wa)
        return fk.mul_wide(wide, table)

    # --------------------------------------------------------- recursion
    def _rec(self, v, li: int, post, tables):
        """DFT of size sizes[li] along v's last axis; `post` is the
        plain table the caller wants multiplied into the output (its
        own twiddles, or the final constant at the top)."""
        nl = self.sizes[li]
        if nl <= 16:
            t = self._matmul(v, tables["AM"][li], nl)
            return self._mulw(t, post, tables)
        n2 = nl // 16
        # x[j1 + 16*j2] -> (*, j1, j2): child DFT over j2 batched by j1
        v2 = v.reshape(v.shape[:-1] + (n2, 16))
        v2 = jnp.swapaxes(v2, -1, -2)                # (N, *b, 16, n2)
        A = self._rec(v2, li + 1, tables["tw"][li], tables)
        B = jnp.swapaxes(A, -1, -2)                  # (N, *b, n2, 16)
        C = self._matmul(B, tables["AM"][li], 16)    # (TO, *b, n2, 16)
        D = jnp.swapaxes(C, -1, -2)                  # (TO, *b, 16, n2)
        D = D.reshape(D.shape[:-2] + (nl,))          # flat k = k2+n2*k1
        return self._mulw(D, post, tables)

    def apply(self, v, tables=None):
        """v: (N, *batch, n) canonical Montgomery limbs -> DFT, same
        shape/form. Pass `tables` (device_tables()) through a jit
        boundary to keep the constants out of the compiled graph."""
        if tables is None:
            tables = self.device_tables()
        return self._rec(v, 0, tables["final"], tables)
