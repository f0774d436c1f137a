"""Batched cubic-extension field kernels (libff Fp3_model equivalent).

Elements have shape (3, num_limbs, *batch). Used for G2 arithmetic on
MNT6 (k=6, quadratic twist over Fq3 -- see curves/mnt.py). Karatsuba-
style multiplication: 6 base-field muls.
"""
from __future__ import annotations

import jax.numpy as jnp

from .fp import FpKernel


class Fp3Kernel:
    """Fp[v]/(v^3 - beta) with small integer beta (e.g. 5)."""

    ext_degree = 3

    def __init__(self, fp: FpKernel, non_residue: int):
        self.fp = fp
        b = non_residue % fp.p
        self.beta_is_neg = b > fp.p // 2
        self.beta_small = fp.p - b if self.beta_is_neg else b
        self.N = fp.N

    def __hash__(self):
        return hash((self.fp.p, self.beta_small, self.beta_is_neg, 3))

    def __eq__(self, o):
        return (isinstance(o, Fp3Kernel) and o.fp == self.fp
                and o.beta_small == self.beta_small
                and o.beta_is_neg == self.beta_is_neg)

    # -- structure ---------------------------------------------------------
    def zeros(self, batch_shape):
        return jnp.zeros((3, self.N) + tuple(batch_shape), dtype=jnp.uint32)

    def one(self, batch_shape):
        z = self.fp.zeros(batch_shape)
        return jnp.stack([self.fp.one(batch_shape), z, z])

    def mul_by_nonresidue(self, a):
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
    # Coefficient-triple ops run as ONE base-field call with the
    # coefficient axis moved behind the limbs (compile-lean: one call
    # site, not three). See ops/fp.py "call-site stacking".
    def _flat(self, a):
        return jnp.moveaxis(a, 0, 1)        # (N, 3, *batch)

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
        # Karatsuba cubic (6 muls; libff Fp3_model::operator* shape),
        # the six base-field products stacked into one call site
        fp = self.fp
        sums = fp.add(fp.stack([a[1], a[0], a[0], b[1], b[0], b[0]]),
                      fp.stack([a[2], a[1], a[2], b[2], b[1], b[2]]))
        s12, s01, s02, u12, u01, u02 = fp.unstack(sums)
        prod = fp.mul(fp.stack([a[0], a[1], a[2], s12, s01, s02]),
                      fp.stack([b[0], b[1], b[2], u12, u01, u02]))
        v0, v1, v2, t12, t01, t02 = fp.unstack(prod)
        c0 = fp.add(v0, self.mul_by_nonresidue(
            fp.sub(fp.sub(t12, v1), v2)))
        c1 = fp.add(fp.sub(fp.sub(t01, v0), v1),
                    self.mul_by_nonresidue(v2))
        c2 = fp.add(fp.sub(fp.sub(t02, v0), v2), v1)
        return jnp.stack([c0, c1, c2])

    def sqr(self, a):
        return self.mul(a, a)

    # -- call-site stacking ----------------------------------------------------
    @staticmethod
    def stack(xs):
        return jnp.stack(xs, axis=2)

    @staticmethod
    def unstack(a):
        return [a[:, :, i] for i in range(a.shape[2])]

    def mul_small(self, a, k: int):
        return jnp.stack([self.fp.mul_small(a[i], k) for i in range(3)])

    def mul_by_const(self, a, k0: int, k1: int, k2: int):
        """a * (k0 + k1 v + k2 v^2) for python-int constants (the MNT6
        G2 twist a-coefficient a*v^2): schoolbook with v^3 = beta."""
        fp = self.fp
        nr = self.fp.p - self.beta_small if self.beta_is_neg \
            else self.beta_small

        def term(x, k):
            return fp.mul_small(x, k % self.fp.p)

        c0 = fp.add(fp.add(term(a[0], k0), term(a[2], nr * k1)),
                    term(a[1], nr * k2))
        c1 = fp.add(fp.add(term(a[1], k0), term(a[0], k1)),
                    term(a[2], nr * k2))
        c2 = fp.add(fp.add(term(a[2], k0), term(a[1], k1)),
                    term(a[0], k2))
        return jnp.stack([c0, c1, c2])

    def inv(self, a):
        # libff Fp3_model::inverse (CH81 method)
        fp = self.fp
        t0 = fp.sqr(a[0])
        t1 = fp.sqr(a[1])
        t2 = fp.sqr(a[2])
        t3 = fp.mul(a[0], a[1])
        t4 = fp.mul(a[0], a[2])
        t5 = fp.mul(a[1], a[2])
        c0 = fp.sub(t0, self.mul_by_nonresidue(t5))
        c1 = fp.sub(self.mul_by_nonresidue(t2), t3)
        c2 = fp.sub(t1, t4)
        t6 = fp.inv(fp.add(fp.mul(a[0], c0), self.mul_by_nonresidue(
            fp.add(fp.mul(a[2], c1), fp.mul(a[1], c2)))))
        return jnp.stack([fp.mul(t6, c0), fp.mul(t6, c1), fp.mul(t6, c2)])

    # -- predicates / select -------------------------------------------------------
    def is_zero(self, a):
        z = jnp.logical_and(self.fp.is_zero(a[0]), self.fp.is_zero(a[1]))
        return jnp.logical_and(z, self.fp.is_zero(a[2]))

    def eq(self, a, b):
        e = jnp.logical_and(self.fp.eq(a[0], b[0]), self.fp.eq(a[1], b[1]))
        return jnp.logical_and(e, self.fp.eq(a[2], b[2]))

    def select(self, cond, a, b):
        return jnp.where(cond[None, None], a, b)

    # -- host conversions -------------------------------------------------------------
    def encode(self, xs, mont=True):
        """List of host Fp3 elements (with .c0/.c1/.c2) -> (3, N, len)."""
        import numpy as np
        c0 = self.fp.encode([int(x.c0) for x in xs], mont)
        c1 = self.fp.encode([int(x.c1) for x in xs], mont)
        c2 = self.fp.encode([int(x.c2) for x in xs], mont)
        return np.stack([c0, c1, c2])

    def decode(self, arr, mont=True):
        return (self.fp.decode(arr[0], mont), self.fp.decode(arr[1], mont),
                self.fp.decode(arr[2], mont))
