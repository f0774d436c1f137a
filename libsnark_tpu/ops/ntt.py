"""Radix-2 evaluation domains: NTT / iNTT / coset transforms over Fr.

The libfqfft equivalent (SURVEY.md section 2.8): exactly the 8-method
surface the QAP witness map consumes (r1cs_to_qap.tcc:252-321): FFT, iFFT,
cosetFFT, icosetFFT, evaluate_all_lagrange_polynomials,
compute_vanishing_polynomial, add_poly_Z, divide_by_Z_on_coset.

Design: iterative Cooley-Tukey with a host-precomputed bit-reversal
permutation and per-stage twiddle tables (Montgomery form, device
constants). Each stage is one batched field mul + add/sub over the whole
array -- MXU-free but VPU-saturating; the fori/stage loop is a Python loop
over log2(m) <= 28 stages (small graph). Values are (N, m) uint32 limb
arrays in Montgomery form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os

from .limbs import ints_to_limbs


def _mxu_enabled() -> bool:
    """LIBSNARK_TPU_NTT_MXU=1 routes fft/ifft through the MXU digit-
    matmul path (ops/ntt_mxu.py). Off by default until device-validated;
    the explicit fft_mxu/ifft_mxu methods work regardless."""
    return os.environ.get("LIBSNARK_TPU_NTT_MXU", "0") == "1"


def batch_inverse(xs, p):
    """Montgomery batch inversion: one modular inverse for the whole list."""
    n = len(xs)
    prefix = [1] * (n + 1)
    for i, x in enumerate(xs):
        prefix[i + 1] = prefix[i] * x % p
    inv_all = pow(prefix[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % p
        inv_all = inv_all * xs[i] % p
    return out


def _bit_reverse_perm(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


class Radix2Domain:
    """Evaluation domain of size m = 2^logm over the scalar field.

    Mirrors libfqfft basic_radix2_domain. Twiddles are precomputed host-side
    from FieldParams.root_of_unity and installed as device constants.
    """

    def __init__(self, fr_kernel, params, logm: int):
        assert logm <= params.two_adicity, \
            f"domain 2^{logm} exceeds field two-adicity {params.two_adicity}"
        self.fk = fr_kernel
        self.params = params
        self.logm = logm
        self.m = 1 << logm
        p = params.p
        self.p = p
        # primitive m-th root of unity
        self.omega = pow(params.root_of_unity,
                         1 << (params.two_adicity - logm), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.m_inv = pow(self.m, -1, p)
        self.generator = params.multiplicative_generator
        self.generator_inv = pow(self.generator, -1, p)
        self._perm = _bit_reverse_perm(logm)
        self._tw = self._twiddles(self.omega)
        self._tw_inv = self._twiddles(self.omega_inv)

    def _twiddles(self, w):
        """Per-stage twiddle tables in Montgomery form.

        Stage s (1-based) has half = 2^(s-1) butterflies per block using
        w_s^j, w_s = w^(m / 2^s), j < half.
        """
        tables = []
        for s in range(1, self.logm + 1):
            half = 1 << (s - 1)
            ws = pow(w, self.m >> s, self.p)
            tw = [pow(ws, j, self.p) for j in range(half)]
            tables.append(np.asarray(
                ints_to_limbs([t * self.params.R % self.p for t in tw],
                              self.fk.N)))
        return tables

    # ------------------------------------------------------------- MXU path
    def _mxdft(self, kind: str):
        """Cached MxDft instances: "fwd", "inv" (1/m folded into the
        final constant), "coset" (generator^j input scaling folded into
        the DFT matrices), "icoset" (inverse + generator^-k output
        scaling folded)."""
        key = "_mx_" + kind
        if getattr(self, key, None) is None:
            from .ntt_mxu import MxDft
            dtype = os.environ.get("LIBSNARK_TPU_NTT_MXU_DTYPE", "int8")
            if kind == "fwd":
                mx = MxDft(self.fk, self.logm, self.omega, dtype=dtype)
            elif kind == "inv":
                mx = MxDft(self.fk, self.logm, self.omega_inv,
                           scale=self.m_inv, dtype=dtype)
            elif kind == "coset":
                mx = MxDft(self.fk, self.logm, self.omega, dtype=dtype,
                           coset_in=self.generator)
            elif kind == "icoset":
                mx = MxDft(self.fk, self.logm, self.omega_inv,
                           scale=self.m_inv, dtype=dtype,
                           coset_out=self.generator_inv)
            else:  # icoset_divz: 1/Z(g) (constant on the coset) rides
                # the final correction too -- the QAP witness map's
                # divide_by_Z + icosetFFT collapse into one transform
                zinv = pow(self.vanishing_eval(self.generator), -1, self.p)
                mx = MxDft(self.fk, self.logm, self.omega_inv,
                           scale=self.m_inv * zinv % self.p, dtype=dtype,
                           coset_out=self.generator_inv)
            setattr(self, key, mx)
        return getattr(self, key)

    def fft_mxu(self, a, tables=None):
        """DFT via MXU digit matmuls (natural order, == fft)."""
        return self._mxdft("fwd").apply(a, tables)

    def ifft_mxu(self, a, tables=None):
        """Inverse DFT via MXU digit matmuls (1/m scaling included)."""
        return self._mxdft("inv").apply(a, tables)

    def device_tables(self):
        """Twiddle/permutation/coset tables as a jit-argument pytree.

        Passing this through the jit boundary makes the (large) integer
        tables executable PARAMETERS instead of inline HLO literals --
        at 2^20 the literal form is hundreds of MB of HLO and overflows
        the remote compile service's request limit.
        """
        if getattr(self, "_dt", None) is None:
            self._dt = {
                "tw": tuple(jnp.asarray(t) for t in self._tw),
                "tw_inv": tuple(jnp.asarray(t) for t in self._tw_inv),
                "perm": jnp.asarray(self._perm),
                "coset": jnp.asarray(self._powers_table(self.generator)),
                "coset_inv": jnp.asarray(
                    self._powers_table(self.generator_inv)),
            }
            if 1 <= self.logm and self.m <= self.LEAN_MAX:
                for kind in ("fwd", "inv"):
                    self._dt["lean_" + kind] = tuple(
                        jnp.asarray(t) for t in self._lean(kind))
            if _mxu_enabled():
                for kind in ("fwd", "inv", "coset", "icoset",
                             "icoset_divz"):
                    self._dt["mxu_" + kind] = \
                        self._mxdft(kind).device_tables()
        return self._dt

    def _powers_table(self, g: int):
        pw = [1] * self.m
        for i in range(1, self.m):
            pw[i] = pw[i - 1] * g % self.p
        return ints_to_limbs([v * self.params.R % self.p for v in pw],
                             self.fk.N)

    # ----------------------------------------------------------- lean core
    # Compile-lean NTT for small m: all log2(m) stages share ONE
    # gather+mul+add call site inside a fori_loop, driven by
    # host-precomputed flat index/twiddle tables (the "minus" butterfly
    # halves bake the negation into the twiddle). The classic per-stage
    # python loop re-traces mul/add/sub with a different shape per
    # stage -- ~18 call sites per transform, the dominant cold-compile
    # cost of every witness-map program on a 1-core host. Tables are
    # (logm, m), so this is gated to m <= LEAN_MAX (3 MB at 2^12).
    LEAN_MAX = 1 << 12

    def _lean_tables(self, w):
        """(A, B, T): out = in[A[s]] + T[s] * in[B[s]] per stage s."""
        m, logm, p = self.m, self.logm, self.p
        A = np.zeros((logm, m), dtype=np.int32)
        B = np.zeros((logm, m), dtype=np.int32)
        T = np.zeros((logm, m), dtype=object)
        i = np.arange(m)
        for s in range(1, logm + 1):
            half = 1 << (s - 1)
            ws = pow(w, m >> s, p)
            tw = [pow(ws, j, p) for j in range(half)]
            r = i % (2 * half)
            lower = r < half
            A[s - 1] = np.where(lower, i, i - half)
            B[s - 1] = np.where(lower, i + half, i)
            for idx in range(m):
                t = tw[r[idx] % half]
                T[s - 1, idx] = t if lower[idx] else (p - t) % p
        Tl = ints_to_limbs([int(v) * self.params.R % p
                            for v in T.reshape(-1)], self.fk.N)
        return A, B, Tl.reshape(self.fk.N, logm, m)

    def _lean(self, kind: str):
        key = "_lean_" + kind
        if getattr(self, key, None) is None:
            setattr(self, key, self._lean_tables(
                self.omega if kind == "fwd" else self.omega_inv))
        return getattr(self, key)

    def _fft_core_lean(self, a, tables, perm=None):
        fk = self.fk
        A, B, T = tables
        A, B, T = jnp.asarray(A), jnp.asarray(B), jnp.asarray(T)
        a = a[..., jnp.asarray(self._perm) if perm is None else perm]

        def body(s, x):
            u = jnp.take(x, jnp.take(A, s, axis=0), axis=-1)
            v = jnp.take(x, jnp.take(B, s, axis=0), axis=-1)
            tw = jax.lax.dynamic_index_in_dim(T, s, axis=1,
                                              keepdims=False)
            tw = tw.reshape((fk.N,) + (1,) * (x.ndim - 2) + (self.m,))
            return fk.add(u, fk.mul(v, jnp.broadcast_to(tw, x.shape)))

        return jax.lax.fori_loop(0, self.logm, body, a)

    # ------------------------------------------------------------------ core
    def _fft_core(self, a, tables, perm=None):
        """In-order input -> in-order output iterative CT NTT.

        a: (N, m) Montgomery limbs.
        """
        fk = self.fk
        m, logm = self.m, self.logm
        a = a[..., jnp.asarray(self._perm) if perm is None else perm]
        for s in range(1, logm + 1):
            half = 1 << (s - 1)
            blocks = m >> s
            # view as (.., blocks, 2, half)
            shp = a.shape[:-1]
            v = a.reshape(shp + (blocks, 2, half))
            u = v[..., 0, :]
            w = v[..., 1, :]
            tw = jnp.asarray(tables[s - 1]).reshape(
                (fk.N,) + (1,) * (len(shp) - 1 + 1) + (half,))
            wt = fk.mul(w.reshape(shp + (blocks * half,)),
                        jnp.broadcast_to(tw, shp + (blocks, half)).reshape(
                            shp + (blocks * half,)))
            wt = wt.reshape(shp + (blocks, half))
            out0 = fk.add(u.reshape(shp + (blocks * half,)),
                          wt.reshape(shp + (blocks * half,)))
            out1 = fk.sub(u.reshape(shp + (blocks * half,)),
                          wt.reshape(shp + (blocks * half,)))
            a = jnp.stack([out0.reshape(shp + (blocks, half)),
                           out1.reshape(shp + (blocks, half))],
                          axis=-2).reshape(shp + (m,))
        return a

    def fft(self, a, dt=None):
        """Evaluate: coefficients -> values on the domain (natural order)."""
        if _mxu_enabled():
            return self.fft_mxu(a, dt.get("mxu_fwd") if dt else None)
        if 1 <= self.logm and self.m <= self.LEAN_MAX:
            return self._fft_core_lean(
                a, dt["lean_fwd"] if dt else self._lean("fwd"),
                dt["perm"] if dt else None)
        if dt is not None:
            return self._fft_core(a, dt["tw"], dt["perm"])
        return self._fft_core(a, self._tw)

    def ifft(self, a, dt=None):
        """Interpolate: values -> coefficients, scaled by 1/m."""
        if _mxu_enabled():
            return self.ifft_mxu(a, dt.get("mxu_inv") if dt else None)
        if 1 <= self.logm and self.m <= self.LEAN_MAX:
            out = self._fft_core_lean(
                a, dt["lean_inv"] if dt else self._lean("inv"),
                dt["perm"] if dt else None)
        else:
            out = (self._fft_core(a, dt["tw_inv"], dt["perm"])
                   if dt is not None else self._fft_core(a, self._tw_inv))
        return self.fk.mul_small(out, self.m_inv)

    # ------------------------------------------------------------- coset forms
    def _mul_by_powers(self, a, g: int):
        """a[i] *= g^i (host int g), via device constant table."""
        fk = self.fk
        pw = [1] * self.m
        for i in range(1, self.m):
            pw[i] = pw[i - 1] * g % self.p
        tbl = jnp.asarray(ints_to_limbs([v * self.params.R % self.p
                                         for v in pw], fk.N))
        tbl = tbl.reshape((fk.N,) + (1,) * (a.ndim - 2) + (self.m,))
        return fk.mul(a, jnp.broadcast_to(tbl, a.shape))

    def _mul_by_table(self, a, tbl):
        fk = self.fk
        tbl = tbl.reshape((fk.N,) + (1,) * (a.ndim - 2) + (self.m,))
        return fk.mul(a, jnp.broadcast_to(tbl, a.shape))

    def coset_fft(self, a, g: int = None, dt=None):
        if g is None and _mxu_enabled():
            # g^j input scaling folded into the MXU DFT matrices
            return self._mxdft("coset").apply(
                a, dt.get("mxu_coset") if dt else None)
        if dt is not None and g is None:
            return self.fft(self._mul_by_table(a, dt["coset"]), dt)
        g = self.generator if g is None else g
        return self.fft(self._mul_by_powers(a, g))

    def icoset_fft(self, a, g: int = None, dt=None):
        if g is None and _mxu_enabled():
            # g^-k output scaling + 1/m folded into the MXU matrices
            return self._mxdft("icoset").apply(
                a, dt.get("mxu_icoset") if dt else None)
        if dt is not None and g is None:
            return self._mul_by_table(self.ifft(a, dt), dt["coset_inv"])
        g = self.generator if g is None else g
        ginv = pow(g, -1, self.p)
        return self._mul_by_powers(self.ifft(a), ginv)

    # --------------------------------------------------------- vanishing poly
    def vanishing_eval(self, t: int) -> int:
        """Z(t) = t^m - 1 (host int)."""
        return (pow(t, self.m, self.p) - 1) % self.p

    def icoset_fft_divz(self, a, dt=None):
        """icosetFFT(divide_by_Z_on_coset(a)): with the MXU path the
        1/Z(g) constant folds into the transform's final correction;
        otherwise exactly the two-step reference pipeline."""
        if _mxu_enabled():
            return self._mxdft("icoset_divz").apply(
                a, dt.get("mxu_icoset_divz") if dt else None)
        return self.icoset_fft(self.divide_by_z_on_coset(a), dt=dt)

    def divide_by_z_on_coset(self, a, g: int = None):
        """a[i] /= Z(g * w^i); on the coset Z is the constant g^m - 1
        (libfqfft basic_radix2_domain::divide_by_Z_on_coset parity)."""
        g = self.generator if g is None else g
        zi = pow(self.vanishing_eval(g), -1, self.p)
        return self.fk.mul_small(a, zi)

    def z_sparse(self):
        """Vanishing polynomial as sparse (index, int_coeff) pairs:
        Z = x^m - 1."""
        return [(self.m, 1), (0, self.p - 1)]

    def add_poly_z(self, coeff: int, H):
        """H += coeff * Z(x) = coeff*(x^m - 1); H has m+1.. coefficients.

        Host-side helper for small fixups; returns updated device array.
        H: (N, >= m+1)."""
        fk = self.fk
        c = fk.encode_scalar(coeff)
        c = jnp.asarray(c)
        cm = jnp.asarray(fk.encode_scalar(self.p - coeff))
        H = H.at[..., self.m].set(
            fk.add(H[..., self.m], c))
        H = H.at[..., 0].set(fk.add(H[..., 0], cm))
        return H

    # ----------------------------------------------------- lagrange (host side)
    def lagrange_coeffs_at(self, t: int) -> list:
        """L_i(t) for all i, host ints (libfqfft
        evaluate_all_lagrange_polynomials). Used by the generator at the
        secret point; O(m) host work."""
        p, m = self.p, self.m
        t %= p
        zt = self.vanishing_eval(t)
        if zt == 0:
            # t is in the domain: indicator vector
            out = [0] * m
            x = 1
            for i in range(m):
                if x == t:
                    out[i] = 1
                x = x * self.omega % p
            return out
        # L_i(t) = Z(t) * w^i / (m * (t - w^i)); batch-invert the (t - w^i)
        minv = self.m_inv
        xs, diffs = [], []
        x = 1
        for i in range(m):
            xs.append(x)
            diffs.append((t - x) % p)
            x = x * self.omega % p
        invs = batch_inverse(diffs, p)
        zt_minv = zt * minv % p
        return [zt_minv * xs[i] % p * invs[i] % p for i in range(m)]

    def domain_elements(self) -> list:
        out = [1] * self.m
        for i in range(1, self.m):
            out[i] = out[i - 1] * self.omega % self.p
        return out


@functools.lru_cache(maxsize=None)
def get_domain_size(n: int) -> int:
    """Smallest power-of-two >= n (force_pow_2_domain semantics)."""
    return 1 << max(1, (n - 1)).bit_length() if n > 1 else 1
