"""Evaluation-domain selection: basic / extended / step radix-2 domains.

The libfqfft surface the reference consumes through
``get_evaluation_domain(min_size)`` (reductions/r1cs_to_qap/
r1cs_to_qap.tcc:40-41; the ``force_pow_2_domain`` option at
r1cs_gg_ppzksnark.hpp:386 forces the basic domain). libfqfft picks, in
order: basic_radix2 (m a power of two within the field's two-adicity),
extended_radix2 (m twice the largest power-of-two order), step_radix2
(m = 2^k + 2^r), then rounds min_size up to the nearest representable
size. QAP/SAP/SSP degrees -- and hence key/proof sizes -- follow the
selected m, so parity at arbitrary constraint counts needs all three.

TPU-first design: both non-basic domains are ONE construction here, the
two-part CRT domain S = V(x^n1 - c1) ∪ V(x^n2 - c2) with n2 | n1 (powers
of two) and gcd = 1. Evaluation folds coefficients mod each binomial
(vectorized chunk-sums) and runs two radix-2 NTTs; interpolation runs the
two inverse NTTs and recombines by CRT, where x^n1 - c1 mod (x^n2 - c2)
is the CONSTANT c2^(n1/n2) - c1 -- so the lift costs one vector multiply
instead of a polynomial division. extended = (n1 == n2, c1 = 1,
c2 = shift^n1); step = (n2 < n1, c1 = 1, c2 = w^n2 with w of order 2*n1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import ints_to_limbs
from .ntt import Radix2Domain, batch_inverse


class TwoPartDomain:
    """Union of the roots of x^n1 - 1 and a disjoint coset of the
    n2-th roots of unity (n2 | n1). Elements are ordered
    [w1^0 .. w1^(n1-1), shift*w2^0 .. shift*w2^(n2-1)].

    ``kind`` is "extended" (n1 == n2, shift = g^2 with g the field's
    multiplicative generator -- so the witness map's g-coset stays
    disjoint from the domain) or "step" (shift = a primitive 2*n1-th
    root of unity, libfqfft step_radix2 shape).
    """

    def __init__(self, fk, params, log1: int, log2: int):
        assert log2 <= log1
        self.fk = fk
        self.params = params
        self.p = p = params.p
        self.n1 = 1 << log1
        self.n2 = 1 << log2
        self.m = self.n1 + self.n2
        self.kind = "extended" if log1 == log2 else "step"
        self.dom1 = Radix2Domain(fk, params, log1)
        self.dom2 = Radix2Domain(fk, params, log2)
        self.generator = params.multiplicative_generator
        self.generator_inv = pow(self.generator, -1, p)
        if self.kind == "extended":
            self.shift = self.generator * self.generator % p
        else:
            assert log1 + 1 <= params.two_adicity, \
                "step domain needs a 2*n1-th root of unity"
            self.shift = pow(params.root_of_unity,
                             1 << (params.two_adicity - (log1 + 1)), p)
        self.shift_inv = pow(self.shift, -1, p)
        self.c2 = pow(self.shift, self.n2, p)
        # x^n1 - 1 mod (x^n2 - c2) = c2^(n1/n2) - 1 (constant, n2 | n1)
        self.k0 = (pow(self.c2, self.n1 // self.n2, p) - 1) % p
        assert self.k0 != 0, "domain parts are not coprime"
        self.k0_inv = pow(self.k0, -1, p)
        self.K = self.m // self.n2          # fold chunks for r mod M2
        self._dt = None

    # ------------------------------------------------------------- helpers
    def _pow_table(self, g: int, n: int):
        """Montgomery table [g^0 .. g^(n-1)] as (N, n) limbs."""
        p, R = self.p, self.params.R
        pw = [1] * n
        for i in range(1, n):
            pw[i] = pw[i - 1] * g % p
        return ints_to_limbs([v * R % p for v in pw], self.fk.N)

    def _mul_table(self, a, tbl):
        fk = self.fk
        tbl = jnp.asarray(tbl)
        t = tbl.reshape((fk.N,) + (1,) * (a.ndim - 2) + (tbl.shape[-1],))
        return fk.mul(a, jnp.broadcast_to(t, a.shape[:-1] + t.shape[-1:]))

    # u32 lazy column sums of 16-bit limbs overflow past 2^16 addends;
    # folds wider than _KB chunks run in two weighted stages
    _KB = 1 << 12

    def _fold_tables(self, K: int):
        """Weight tables for a (possibly two-stage) fold by powers of
        c2: (w_lo, w_hi) with w_hi None for the single-stage case."""
        if K <= self._KB:
            return (jnp.asarray(self._pow_table(self.c2, K)), None)
        Ka = -(-K // self._KB)
        return (jnp.asarray(self._pow_table(self.c2, self._KB)),
                jnp.asarray(self._pow_table(
                    pow(self.c2, self._KB, self.p), Ka)))

    def _fold_mod_binomial(self, a, tables, K: int):
        """a (.., K*n2) -> a mod (x^n2 - c2) (.., n2): chunk-weighted
        lazy column sums, split into two stages when K > _KB so the
        u32 accumulators never overflow."""
        fk = self.fk
        n2 = self.n2
        w_lo, w_hi = tables

        def fold(x, w, k):
            ch = x.reshape(x.shape[:-1] + (k, n2))
            wt = w[..., :k].reshape(
                (fk.N,) + (1,) * (x.ndim - 2) + (k, 1))
            weighted = fk.mul(ch, jnp.broadcast_to(wt, ch.shape))
            return fk.reduce_lazy(jnp.sum(weighted, axis=-2))

        if w_hi is None:
            return fold(a, w_lo, K)
        Ka = -(-K // self._KB)
        pad = Ka * self._KB * n2 - a.shape[-1]
        if pad:
            a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
        # stage 1: fold each KB-chunk group -> (.., Ka, n2)
        g = a.reshape(a.shape[:-1] + (Ka, self._KB * n2))
        s1 = fold(g, w_lo, self._KB)            # (.., Ka, n2)
        # stage 2: fold the Ka partials with weights c2^(KB*ka)
        return fold(s1.reshape(s1.shape[:-2] + (Ka * n2,)), w_hi, Ka)

    # --------------------------------------------------------------- tables
    def device_tables(self):
        if self._dt is None:
            fk = self.fk
            self._dt = {
                "d1": self.dom1.device_tables(),
                "d2": self.dom2.device_tables(),
                "w_fold_full": self._fold_tables(self.K),
                "w_fold_r1": self._fold_tables(self.n1 // self.n2),
                "shift_pw": jnp.asarray(
                    self._pow_table(self.shift, self.n2)),
                "shift_ipw": jnp.asarray(
                    self._pow_table(self.shift_inv, self.n2)),
                "coset": jnp.asarray(
                    self._pow_table(self.generator, self.m)),
                "coset_inv": jnp.asarray(
                    self._pow_table(self.generator_inv, self.m)),
                "k0_inv": jnp.asarray(ints_to_limbs(
                    [self.k0_inv * self.params.R % self.p], fk.N)),
                "zc_inv": jnp.asarray(self._divz_tables()),
            }
        return self._dt

    def _divz_tables(self):
        """1/Z(g*x_i) over the g-coset of the domain, as an (N, m)
        Montgomery table. Structure keeps host work tiny: over the
        part-1 coset Z(g*w1^i) cycles with period n1/n2; over part 2 it
        is constant."""
        p, g = self.p, self.generator
        per = self.n1 // self.n2
        f1 = (pow(g, self.n1, p) - 1) % p
        w1n2 = pow(self.dom1.omega, self.n2, p)
        gn2 = pow(g, self.n2, p)
        vals, x = [], gn2
        for _ in range(per):
            vals.append(f1 * ((x - self.c2) % p) % p)
            x = x * w1n2 % p
        gs = g * self.shift % p
        zc2 = (pow(gs, self.n1, p) - 1) % p \
            * ((pow(gs, self.n2, p) - self.c2) % p) % p
        invs = batch_inverse(vals + [zc2], p)
        full = invs[:per] * (self.n1 // per) + [invs[per]] * self.n2
        return ints_to_limbs([v * self.params.R % p for v in full],
                             self.fk.N)

    # ------------------------------------------------------------ transforms
    def fft(self, a, dt=None):
        """coefficients (deg < m) -> values on the domain."""
        fk = self.fk
        dt = dt or self.device_tables()
        n1, n2 = self.n1, self.n2
        # r1 = a mod (x^n1 - 1): fold the n2 top coefficients down
        low = fk.add(a[..., :n2], a[..., n1:])
        r1 = jnp.concatenate([low, a[..., n2:n1]], axis=-1)
        v1 = self.dom1.fft(r1, dt["d1"])
        # r2 = a mod (x^n2 - c2), evaluated on the shift-coset
        r2 = self._fold_mod_binomial(a, dt["w_fold_full"], self.K)
        v2 = self.dom2.fft(self._mul_table(r2, dt["shift_pw"]), dt["d2"])
        return jnp.concatenate([v1, v2], axis=-1)

    def ifft(self, a, dt=None):
        """values on the domain -> coefficients (deg < m), via CRT."""
        fk = self.fk
        dt = dt or self.device_tables()
        n1, n2 = self.n1, self.n2
        r1 = self.dom1.ifft(a[..., :n1], dt["d1"])
        r2 = self._mul_table(self.dom2.ifft(a[..., n1:], dt["d2"]),
                             dt["shift_ipw"])
        r1m = self._fold_mod_binomial(r1, dt["w_fold_r1"], n1 // n2)
        k0i = dt["k0_inv"].reshape(
            (fk.N,) + (1,) * (a.ndim - 2) + (1,))
        t = fk.mul(fk.sub(r2, r1m),
                   jnp.broadcast_to(k0i, r2.shape))
        # a = r1 + (x^n1 - 1) * t
        low = fk.sub(r1[..., :n2], t)
        return jnp.concatenate([low, r1[..., n2:], t], axis=-1)

    def coset_fft(self, a, g: int = None, dt=None):
        dt = dt or self.device_tables()
        if g is None:
            return self.fft(self._mul_table(a, dt["coset"]), dt)
        return self.fft(self._mul_table(
            a, self._pow_table(g, self.m)), dt)

    def icoset_fft(self, a, g: int = None, dt=None):
        dt = dt or self.device_tables()
        if g is None:
            return self._mul_table(self.ifft(a, dt), dt["coset_inv"])
        return self._mul_table(self.ifft(a, dt),
                               self._pow_table(pow(g, -1, self.p), self.m))

    # ------------------------------------------------- vanishing polynomial
    def vanishing_eval(self, t: int) -> int:
        return (pow(t, self.n1, self.p) - 1) \
            * ((pow(t, self.n2, self.p) - self.c2) % self.p) % self.p

    def divide_by_z_on_coset(self, a, dt=None):
        dt = dt or self.device_tables()
        return self._mul_table(a, dt["zc_inv"])

    def icoset_fft_divz(self, a, dt=None):
        return self.icoset_fft(self.divide_by_z_on_coset(a, dt), dt=dt)

    def z_sparse(self):
        """Z = (x^n1 - 1)(x^n2 - c2) as sparse (index, coeff) pairs."""
        p = self.p
        if self.n1 == self.n2:
            return [(self.m, 1), (self.n1, (-(1 + self.c2)) % p),
                    (0, self.c2 % p)]
        return [(self.m, 1), (self.n1, (-self.c2) % p),
                (self.n2, p - 1), (0, self.c2 % p)]

    def add_poly_z(self, coeff: int, H):
        """H += coeff * Z(x), Z = (x^n1 - 1)(x^n2 - c2)
        = x^m - c2*x^n1 - x^n2 + c2 (n1 > n2) or
          x^m - (1 + c2)*x^n1 + c2 (n1 == n2)."""
        fk, p = self.fk, self.p
        updates = {self.m: coeff, 0: coeff * self.c2 % p}
        if self.n1 == self.n2:
            updates[self.n1] = (-coeff * (1 + self.c2)) % p
        else:
            updates[self.n1] = (-coeff * self.c2) % p
            updates[self.n2] = (-coeff) % p
        for idx, v in updates.items():
            c = jnp.asarray(fk.encode_scalar(v))
            H = H.at[..., idx].set(fk.add(H[..., idx], c))
        return H

    # -------------------------------------------------------- host lagrange
    def domain_elements(self):
        p = self.p
        out = [1] * self.n1
        for i in range(1, self.n1):
            out[i] = out[i - 1] * self.dom1.omega % p
        y = self.shift
        for _ in range(self.n2):
            out.append(y)
            y = y * self.dom2.omega % p
        return out

    def lagrange_coeffs_at(self, t: int):
        """L_i(t) for the union domain: part-1 basis polys are the
        subdomain's scaled by M2(t)/M2(x_i); part-2 scaled by
        M1(t)/M1(y_j) = M1(t)/k0 (constant)."""
        p, n1, n2 = self.p, self.n1, self.n2
        t %= p
        if self.vanishing_eval(t) == 0:
            els = self.domain_elements()
            return [1 if x == t else 0 for x in els]
        m1_t = (pow(t, n1, p) - 1) % p
        m2_t = (pow(t, n2, p) - self.c2) % p
        # part 1: L1_i(t) * (t^n2 - c2) / (x_i^n2 - c2)
        n1_inv = pow(n1, -1, p)
        xs, den = [], []
        x = 1
        w1n2 = pow(self.dom1.omega, n2, p)
        m2x = 1  # x_i^n2 cycles: (w1^n2)^i
        for i in range(n1):
            xs.append(x)
            den.append((t - x) % p * ((m2x - self.c2) % p) % p)
            x = x * self.dom1.omega % p
            m2x = m2x * w1n2 % p
        # part 2: L2_j(t) * (t^n1 - 1) / k0;
        # L2_j(t) = (t^n2 - c2) * y_j / (n2 * c2 * (t - y_j))
        ys = []
        y = self.shift
        for j in range(n2):
            ys.append(y)
            den.append((t - y) % p)
            y = y * self.dom2.omega % p
        invs = batch_inverse(den, p)
        out = []
        s1 = m1_t * n1_inv % p * m2_t % p
        for i in range(n1):
            out.append(s1 * xs[i] % p * invs[i] % p)
        s2 = m2_t * pow(n2 * self.c2 % p, -1, p) % p \
            * m1_t % p * self.k0_inv % p
        for j in range(n2):
            out.append(s2 * ys[j] % p * invs[n1 + j] % p)
        return out


def add_scaled_z(fk, domain, out, coeff_m):
    """out += coeff * Z(x) for a DEVICE scalar coeff_m ((N, 1) Montgomery
    limbs); Z taken sparse from the domain (x^m - 1 only on the basic
    radix-2 domain). Shared by the ZK-patched QAP/SAP/SSP witness maps."""
    import jax.numpy as jnp
    for idx, c in domain.z_sparse():
        if c == 1:
            term = coeff_m
        else:
            enc = jnp.asarray(fk.encode_scalar(c)).reshape(
                (fk.N,) + (1,) * (coeff_m.ndim - 1))
            term = fk.mul(coeff_m, jnp.broadcast_to(enc, coeff_m.shape))
        out = out.at[..., idx].set(fk.add(out[..., idx], term[..., 0]))
    return out


@functools.lru_cache(maxsize=None)
def _domain_shape(min_size: int, two_adicity: int, force_pow_2: bool):
    """(log1, log2) with log2 < 0 meaning a basic radix-2 domain of size
    2^log1. Mirrors libfqfft's get_evaluation_domain selection."""
    assert min_size >= 1
    if min_size <= 2:
        return (1, -1)
    ceil_log = (min_size - 1).bit_length()
    if force_pow_2:
        assert ceil_log <= two_adicity, "domain exceeds two-adicity"
        return (ceil_log, -1)
    if min_size == (1 << ceil_log):                     # exact power of 2
        if ceil_log <= two_adicity:
            return (ceil_log, -1)                       # basic
        if ceil_log == two_adicity + 1:
            return (ceil_log - 1, ceil_log - 1)         # extended
        raise ValueError(f"no domain of size {min_size}")
    big_log = ceil_log - 1
    small = min_size - (1 << big_log)
    small_log = (small - 1).bit_length() if small > 1 else 0
    if (1 << big_log) + (1 << small_log) == min_size \
            and big_log + 1 <= two_adicity:
        return (big_log, small_log)                     # exact step
    # round up: basic(2^ceil) if it fits, else step(big + 2^small_log)
    if small_log >= big_log:
        if ceil_log <= two_adicity:
            return (ceil_log, -1)
        if ceil_log == two_adicity + 1:
            return (ceil_log - 1, ceil_log - 1)
        raise ValueError(f"no domain of size {min_size}")
    if big_log + 1 <= two_adicity:
        return (big_log, small_log)
    raise ValueError(f"no domain of size {min_size}")


def get_evaluation_domain(fk, params, min_size: int,
                          force_pow_2: bool = False):
    """libfqfft get_evaluation_domain equivalent: smallest supported
    domain with size >= min_size (exact when min_size is 2^k or
    2^k + 2^r within the field's two-adicity). force_pow_2 reproduces
    the reference's force_pow_2_domain option."""
    log1, log2 = _domain_shape(int(min_size), params.two_adicity,
                               bool(force_pow_2))
    if log2 < 0:
        return Radix2Domain(fk, params, log1)
    return TwoPartDomain(fk, params, log1, log2)
