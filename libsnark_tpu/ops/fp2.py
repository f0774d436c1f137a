"""Batched quadratic-extension field kernels (libff Fp2_model equivalent).

Elements have shape (2, num_limbs, *batch): coefficient axis leading, then
limb axis, then batch (on TPU lanes). Used for G2 arithmetic on BN/BLS
curves. Karatsuba multiplication: 3 base-field muls.
"""
from __future__ import annotations

import jax.numpy as jnp

from .fp import FpKernel


class Fp2Kernel:
    """Fp[s]/(s^2 - beta) with small signed integer beta (e.g. -1, -5)."""

    def __init__(self, fp: FpKernel, non_residue: int):
        self.fp = fp
        # normalize beta into a small signed form when possible
        b = non_residue % fp.p
        self.beta_is_neg = b > fp.p // 2
        self.beta_small = fp.p - b if self.beta_is_neg else b
        self.N = fp.N

    def __hash__(self):
        return hash((self.fp.p, self.beta_small, self.beta_is_neg))

    def __eq__(self, o):
        return (isinstance(o, Fp2Kernel) and o.fp == self.fp
                and o.beta_small == self.beta_small
                and o.beta_is_neg == self.beta_is_neg)

    # -- structure ---------------------------------------------------------
    def zeros(self, batch_shape):
        return jnp.zeros((2, self.N) + tuple(batch_shape), dtype=jnp.uint32)

    def one(self, batch_shape):
        return jnp.stack([self.fp.one(batch_shape),
                          self.fp.zeros(batch_shape)])

    def mul_by_nonresidue(self, a):
        """a * beta in the base field ((N, *batch) shapes). Small |beta|
        goes through an addition chain (a full modular multiply costs a
        compile-time call site the VPU work never justifies)."""
        if self.beta_small == 1:
            out = a
        elif self.beta_small <= 8:
            # double-and-add on the constant: <= 3 adds for k <= 8
            fp = self.fp
            out = a
            for bit in bin(self.beta_small)[3:]:
                out = fp.double(out)
                if bit == "1":
                    out = fp.add(out, a)
        else:
            out = self.fp.mul_small(a, self.beta_small)
        return self.fp.neg(out) if self.beta_is_neg else out

    # -- arithmetic -----------------------------------------------------------
    # Coefficient-pair ops run as ONE base-field call on the (2, N, ..)
    # array with the coefficient axis moved behind the limbs (compile-
    # lean: one call site, not two).
    def _flat(self, a):
        return jnp.moveaxis(a, 0, 1)        # (N, 2, *batch)

    def _unflat(self, a):
        return jnp.moveaxis(a, 1, 0)

    def add(self, a, b):
        return self._unflat(self.fp.add(self._flat(a), self._flat(b)))

    def sub(self, a, b):
        return self._unflat(self.fp.sub(self._flat(a), self._flat(b)))

    def neg(self, a):
        return self._unflat(self.fp.neg(self._flat(a)))

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        # Karatsuba with the three base-field products STACKED into one
        # call site: v0 = a0 b0, v1 = a1 b1, t = (a0+a1)(b0+b1)
        fp = self.fp
        sums = fp.add(fp.stack([a[0], b[0]]), fp.stack([a[1], b[1]]))
        sa, sb = fp.unstack(sums)
        prod = fp.mul(fp.stack([a[0], a[1], sa]),
                      fp.stack([b[0], b[1], sb]))
        v0, v1, t = fp.unstack(prod)
        c0 = fp.add(v0, self.mul_by_nonresidue(v1))
        c1 = fp.sub(t, fp.add(v0, v1))
        return jnp.stack([c0, c1])

    def sqr(self, a):
        # complex squaring: c0 = (a0+a1)(a0+beta a1) - v - beta v ; c1 = 2v
        fp = self.fp
        t0 = fp.add(a[0], a[1])
        t1 = fp.add(a[0], self.mul_by_nonresidue(a[1]))
        prod = fp.mul(fp.stack([a[0], t0]), fp.stack([a[1], t1]))
        v, u = fp.unstack(prod)
        c0 = fp.sub(fp.sub(u, v), self.mul_by_nonresidue(v))
        c1 = fp.add(v, v)
        return jnp.stack([c0, c1])

    # -- call-site stacking (stack axis sits behind the limb axis so the
    # base-field kernels see it as batch) --------------------------------------
    @staticmethod
    def stack(xs):
        return jnp.stack(xs, axis=2)

    @staticmethod
    def unstack(a):
        return [a[:, :, i] for i in range(a.shape[2])]

    def mul_small(self, a, k: int):
        return jnp.stack([self.fp.mul_small(a[0], k),
                          self.fp.mul_small(a[1], k)])

    def mul_by_const(self, a, k0: int, k1: int):
        """a * (k0 + k1 s) for python-int constants (curve a-coeff on
        MNT4 G2 twists): (k0 a0 + nr k1 a1, k0 a1 + k1 a0)."""
        fp = self.fp
        t0 = fp.mul_small(a[0], k0) if k0 != 1 else a[0]
        t1 = fp.mul_small(a[1], k0) if k0 != 1 else a[1]
        if k1 == 0:
            return jnp.stack([t0, t1])
        c0 = fp.add(t0, self.mul_by_nonresidue(fp.mul_small(a[1], k1)))
        c1 = fp.add(t1, fp.mul_small(a[0], k1))
        return jnp.stack([c0, c1])

    def inv(self, a):
        # (a0 - a1 s) / (a0^2 - beta a1^2)
        fp = self.fp
        norm = fp.sub(fp.sqr(a[0]), self.mul_by_nonresidue(fp.sqr(a[1])))
        t = fp.inv(norm)
        return jnp.stack([fp.mul(a[0], t), fp.neg(fp.mul(a[1], t))])

    def conjugate(self, a):
        return jnp.stack([a[0], self.fp.neg(a[1])])

    # -- predicates / select -------------------------------------------------------
    def is_zero(self, a):
        return jnp.logical_and(self.fp.is_zero(a[0]), self.fp.is_zero(a[1]))

    def eq(self, a, b):
        return jnp.logical_and(self.fp.eq(a[0], b[0]), self.fp.eq(a[1], b[1]))

    def select(self, cond, a, b):
        return jnp.where(cond[None, None], a, b)

    # -- host conversions -------------------------------------------------------------
    def encode(self, xs, mont=True):
        """List of host Fp2 elements (with .c0/.c1) -> (2, N, len) numpy."""
        import numpy as np
        c0 = self.fp.encode([int(x.c0) for x in xs], mont)
        c1 = self.fp.encode([int(x.c1) for x in xs], mont)
        return np.stack([c0, c1])

    def decode(self, arr, mont=True):
        c0 = self.fp.decode(arr[0], mont)
        c1 = self.fp.decode(arr[1], mont)
        return c0, c1
