"""Batched prime-field arithmetic kernels (the libff Fp_model equivalent).

All functions are jit-traceable jnp programs over uint32 arrays shaped
``(num_limbs, *batch)`` -- limbs on the leading axis so the batch maps onto
TPU vector lanes. Values live in Montgomery form (x*R mod p, R = 2^(16*N))
exactly as libff stores them (MONTGOMERY_OUTPUT serialization parity).

Core algorithm: schoolbook 16x16->32 limb products accumulated into lazy
32-bit columns, followed by word-at-a-time Montgomery reduction (REDC) with
carry normalization of column i at step i. All column values stay < 2^26
(<< 2^32), so uint32 lanes never overflow. The per-limb loops are
Python-unrolled (static N), fully vectorized over the batch.

Reference behavioral parity: libff Montgomery Fp (mul/add/sub/inverse/pow);
use sites r1cs_gg_ppzksnark.tcc:437-440 etc. This file is the #1 hot-path
dependency of MSM and NTT.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs, ints_to_limbs, limbs_to_int

U32 = jnp.uint32
I32 = jnp.int32


class FpKernel:
    """Batched modular arithmetic for one prime modulus.

    Construct from a ``FieldParams`` (see curves/curve.py). Stateless and
    hashable: safe to close over inside jitted functions.
    """

    def __init__(self, params):
        self.params = params
        self.p = params.p
        self.N = params.num_limbs
        self.n0inv = int(params.n0inv)
        # host-side numpy constants (become jnp constants on trace)
        self.p_np = int_to_limbs(params.p, self.N)
        self.p_list = [int(v) for v in self.p_np]
        self.r2_np = int_to_limbs(params.R2, self.N)
        self.one_mont_np = int_to_limbs(params.R % params.p, self.N)
        self.zero_np = np.zeros(self.N, dtype=np.uint32)
        # exponent bit arrays for Fermat inversion: p-2, MSB first
        e = params.p - 2
        self.inv_bits_np = np.array(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.uint32)

    # -- hashing so jit caches by modulus ------------------------------------
    def __hash__(self):
        return hash((self.p, self.N))

    def __eq__(self, other):
        return isinstance(other, FpKernel) and other.p == self.p

    # ------------------------------------------------------------------ utils
    def _const(self, np_arr, batch_ndim):
        """Reshape an (N,) constant for broadcasting against (N, *batch)."""
        return jnp.asarray(np_arr).reshape((self.N,) + (1,) * batch_ndim)

    def zeros(self, batch_shape):
        return jnp.zeros((self.N,) + tuple(batch_shape), dtype=U32)

    def one(self, batch_shape):
        return jnp.broadcast_to(
            self._const(self.one_mont_np, len(batch_shape)),
            (self.N,) + tuple(batch_shape)).astype(U32)

    # ------------------------------------------------------- carry primitives
    @staticmethod
    def _normalize_lazy(cols):
        """One parallel carry-split pass: columns < 2^32 -> columns < 2^17.

        Value is preserved; assumes the top column's carry fits (callers
        allocate one spare column).
        """
        lo = cols & LIMB_MASK
        hi = cols >> LIMB_BITS
        shifted = jnp.concatenate(
            [jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
        return lo + shifted

    @staticmethod
    def _carry_propagate(cols, out_len=None):
        """Sequential full carry propagation -> limbs < 2^16.

        cols: (K, *batch) with column values < ~2^30. Returns (out_len, *batch).
        Implemented as a lax.scan over the limb axis so the HLO stays O(1)
        in the limb count (compile-size is the binding constraint here).
        """
        K = cols.shape[0]
        out_len = out_len or K

        def step(carry, col):
            v = col + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        carry, outs = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols)
        extra = []
        for _ in range(out_len - K):
            extra.append(carry & LIMB_MASK)
            carry = carry >> LIMB_BITS
        if extra:
            outs = jnp.concatenate([outs, jnp.stack(extra, axis=0)], axis=0)
        return outs[:out_len]

    def _sub_limbs(self, a, b, width):
        """a - b over `width` limbs; returns (diff, borrow_flag). int32 domain.

        Borrow chain as a lax.scan over the limb axis (small HLO).
        """
        ai = a[:width].astype(I32)
        bi = b[:width].astype(I32)

        def step(borrow, ab):
            x, y = ab
            d = x - y - borrow
            borrow = (d < 0).astype(I32)
            return borrow, (d + (borrow << LIMB_BITS)).astype(U32)

        borrow, outs = jax.lax.scan(step, jnp.zeros_like(ai[0]), (ai, bi))
        return outs, borrow

    def _cond_sub_p(self, r):
        """r (N+1 or N limbs, value < 2p) -> canonical value < p (N limbs)."""
        width = r.shape[0]
        pext = np.zeros(width, dtype=np.uint32)
        pext[: self.N] = self.p_np
        pc = jnp.asarray(pext).reshape((width,) + (1,) * (r.ndim - 1))
        pc = jnp.broadcast_to(pc, r.shape)
        diff, borrow = self._sub_limbs(r, pc, width)
        keep = (borrow != 0)
        out = jnp.where(keep[None], r, diff)
        return out[: self.N]

    # --------------------------------------------------------------- arithmetic
    def add(self, a, b):
        s = a + b  # lazy, < 2^17
        ext = jnp.concatenate([s, jnp.zeros_like(s[:1])], axis=0)
        return self._cond_sub_p(self._carry_propagate(ext))

    def sub(self, a, b):
        d, borrow = self._sub_limbs(a, b, self.N)
        # if borrowed, add p back (sequential carry)
        pc = jnp.broadcast_to(self._const(self.p_np, a.ndim - 1), a.shape)
        fix = d + jnp.where((borrow != 0)[None], pc, jnp.zeros_like(pc))
        return self._carry_propagate(fix, out_len=self.N)

    def neg(self, a):
        return self.sub(self.zeros(a.shape[1:]), a)

    def double(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, cond, a, b):
        """cond: batch-shaped bool; picks a where True."""
        return jnp.where(cond[None], a, b)

    # -- call-site stacking ---------------------------------------------------
    # Independent field ops fused into ONE traced call by stacking the
    # operands on a fresh batch axis right behind the limb axis. XLA's
    # HLO-pass cost scales with the number of op *call sites*, not lanes,
    # so k stacked muls compile ~k-fold faster than k separate ones --
    # the backbone of the compile-lean group-law schedules (ops/ec.py).
    @staticmethod
    def stack(xs):
        return jnp.stack(xs, axis=1)

    @staticmethod
    def unstack(a):
        return [a[:, i] for i in range(a.shape[1])]

    # -- multiplication ---------------------------------------------------------
    #
    # Graph-size note: both mul and _redc run their limb loop as a
    # lax.scan with a SHIFTING accumulator -- each step consumes column 0
    # and shifts the window down one, so every slice update is the static
    # [0:N] / [1:N+1] (no per-iteration dynamic-update-slice chains).
    # HLO is O(1) in the limb count; the unrolled predecessor was the
    # dominant compile-time cost of every MSM/NTT program.

    def _redc(self, cols):
        """Montgomery reduction of lazy columns (K >= 2N+1, value < R*p).

        Columns must be < ~2^26 on entry (normalized enough). Returns
        canonical (N, *batch) value < p.
        """
        N = self.N
        K = cols.shape[0]
        if K < 2 * N + 2:
            pad = jnp.zeros((2 * N + 2 - K,) + cols.shape[1:], dtype=U32)
            cols = jnp.concatenate([cols, pad], axis=0)
        p_vec = self._const(self.p_np, cols.ndim - 1)
        n0inv = self.n0inv
        zrow = jnp.zeros_like(cols[:1])

        def step(acc, _):
            # low 16 bits of the running value == acc[0] mod 2^16 (exact:
            # lazy column < 2^32)
            u = ((acc[0] & LIMB_MASK) * n0inv) & LIMB_MASK
            prod = u[None] * p_vec                         # (N, *batch)
            acc = acc.at[0:N].add(prod & LIMB_MASK)
            acc = acc.at[1:N + 1].add(prod >> LIMB_BITS)
            # column 0 is now == 0 mod 2^16; fold its carry, drop it,
            # shift the window (the Montgomery /2^16)
            acc = acc.at[1].add(acc[0] >> LIMB_BITS)
            return jnp.concatenate([acc[1:], zrow], axis=0), None

        acc, _ = jax.lax.scan(step, cols, None, length=N)
        res = self._carry_propagate(acc[: N + 2], out_len=self.N + 1)
        return self._cond_sub_p(res)

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p. Inputs canonical (< p).

        On TPU backends this dispatches to the single-launch Pallas CIOS
        kernel (ops/pallas_fp.py); elsewhere, a lax.scan over a's limbs
        interleaving the partial product and the reduction step (columns
        stay < 2^23).
        """
        from .pallas_fp import pallas_enabled, mont_mul
        if pallas_enabled():
            return mont_mul(self, jnp.asarray(a), jnp.asarray(b))
        N = self.N
        p_vec = self._const(self.p_np, a.ndim - 1)
        n0inv = self.n0inv
        acc0 = jnp.zeros((N + 2,) + a.shape[1:], dtype=U32)
        zrow = acc0[:1]

        def step(acc, a_i):
            prod = a_i[None] * b                           # (N, *batch) exact
            acc = acc.at[0:N].add(prod & LIMB_MASK)
            acc = acc.at[1:N + 1].add(prod >> LIMB_BITS)
            u = ((acc[0] & LIMB_MASK) * n0inv) & LIMB_MASK
            prod = u[None] * p_vec
            acc = acc.at[0:N].add(prod & LIMB_MASK)
            acc = acc.at[1:N + 1].add(prod >> LIMB_BITS)
            acc = acc.at[1].add(acc[0] >> LIMB_BITS)
            return jnp.concatenate([acc[1:], zrow], axis=0), None

        acc, _ = jax.lax.scan(step, acc0, a)
        res = self._carry_propagate(acc, out_len=self.N + 1)
        return self._cond_sub_p(res)

    def mul_wide(self, a, b):
        """Montgomery product for a WIDE first operand: a has Wa >= N
        16-bit limbs (value < 2^(16*Wa)), b is (N, *bcast) with value < p.
        Returns canonical a*b*2^(-16*Wa) mod p -- the caller tracks the
        extra 2^(-16*(Wa-N)) factor (vs mul's R^-1) and corrects once.

        Same interleaved CIOS scan as mul, just over Wa steps; the lazy
        column bounds are step-count independent (each column exits the
        N+2 window after <= N+2 shifts). b may broadcast against a's
        batch dims from the right (e.g. a (Wa, B, 16, n2) with a twiddle
        table b (N, 16, n2))."""
        N = self.N
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        bfull = jnp.broadcast_to(
            b.reshape((N,) + (1,) * (len(batch) - (b.ndim - 1))
                      + b.shape[1:]), (N,) + batch)
        p_vec = self._const(self.p_np, len(batch))
        n0inv = self.n0inv
        acc0 = jnp.zeros((N + 2,) + batch, dtype=U32)
        zrow = acc0[:1]

        def step(acc, a_i):
            prod = a_i[None] * bfull
            acc = acc.at[0:N].add(prod & LIMB_MASK)
            acc = acc.at[1:N + 1].add(prod >> LIMB_BITS)
            u = ((acc[0] & LIMB_MASK) * n0inv) & LIMB_MASK
            prod = u[None] * p_vec
            acc = acc.at[0:N].add(prod & LIMB_MASK)
            acc = acc.at[1:N + 1].add(prod >> LIMB_BITS)
            acc = acc.at[1].add(acc[0] >> LIMB_BITS)
            return jnp.concatenate([acc[1:], zrow], axis=0), None

        a_b = jnp.broadcast_to(a[:, None].reshape(
            (a.shape[0],) + (1,) * (len(batch) - (a.ndim - 1))
            + a.shape[1:]), (a.shape[0],) + batch)
        acc, _ = jax.lax.scan(step, acc0, a_b)
        res = self._carry_propagate(acc, out_len=self.N + 1)
        return self._cond_sub_p(res)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_small(self, a, k: int):
        """a * k mod p for a python-int constant k (any size)."""
        enc = self._const(self.encode_scalar(k), a.ndim - 1)
        return self.mul(a, jnp.broadcast_to(enc, a.shape))

    # -- lazy reductions (for segment sums / linear combinations) ----------------
    def reduce_lazy(self, cols):
        """Reduce lazy column sums (value < 2^16 * p) to canonical form.

        cols: (K, *batch) uint32 with K <= 2N+1, columns < 2^32 (e.g. the
        result of segment-summing <=2^16 Montgomery-form values). Returns the
        exact sum mod p, still in Montgomery form.
        """
        K = cols.shape[0]
        pad = jnp.zeros((2 * self.N + 2 - K,) + cols.shape[1:], dtype=U32)
        ext = jnp.concatenate([cols, pad], axis=0)
        ext = self._normalize_lazy(ext)          # columns < 2^17
        red = self._redc(ext)                    # = sum * R^-1
        r2 = jnp.broadcast_to(self._const(self.r2_np, red.ndim - 1), red.shape)
        return self.mul(red, r2)                 # * R^2 * R^-1 = sum

    # -- exponentiation / inversion ----------------------------------------------
    def pow_const(self, a, e: int):
        """a^e for a fixed python-int exponent, via lax.scan (small graph)."""
        if e == 0:
            return self.one(a.shape[1:])
        bits = np.array([(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
                        dtype=np.uint32)

        def body(acc, bit):
            acc = self.sqr(acc)
            withmul = self.mul(acc, a)
            acc = jnp.where(bit > 0, withmul, acc)
            return acc, None

        # first bit is always 1: start from a
        out, _ = jax.lax.scan(body, a, jnp.asarray(bits[1:]))
        return out

    def inv(self, a):
        """Batched inversion via Fermat: a^(p-2). a must be nonzero."""
        return self.pow_const(a, self.p - 2)

    # -- Montgomery form conversion (device side) ----------------------------------
    def to_mont(self, a):
        r2 = jnp.broadcast_to(self._const(self.r2_np, a.ndim - 1), a.shape)
        return self.mul(a, r2)

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[0].set(1)
        return self.mul(a, one)

    # -- host conversions -------------------------------------------------------------
    def encode(self, xs, mont=True):
        """Python ints -> (N, len(xs)) device-ready limbs (Montgomery form)."""
        if mont:
            xs = [int(x) * self.params.R % self.p for x in xs]
        else:
            xs = [int(x) % self.p for x in xs]
        return ints_to_limbs(xs, self.N)

    def encode_scalar(self, x, mont=True):
        if mont:
            x = int(x) * self.params.R % self.p
        return int_to_limbs(int(x) % self.p, self.N)

    def decode(self, arr, mont=True):
        """(N, *batch) device array -> numpy object array of python ints."""
        a = np.asarray(arr).astype(object)
        flat = a.reshape(self.N, -1)
        vals = [sum(int(flat[i, j]) << (LIMB_BITS * i) for i in range(self.N))
                for j in range(flat.shape[1])]
        if mont:
            rinv = pow(self.params.R, -1, self.p)
            vals = [v * rinv % self.p for v in vals]
        out = np.array(vals, dtype=object)
        return out.reshape(a.shape[1:]) if a.ndim > 1 else out.reshape(())
