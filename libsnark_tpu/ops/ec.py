"""Batched elliptic-curve group kernels (libff G1/G2 equivalent).

Points are Jacobian-coordinate triples ``(X, Y, Z)`` of field arrays
(infinity encoded as Z = 0), batched on trailing axes and generic over the
coordinate-field kernel (FpKernel for G1, Fp2Kernel for G2). All group ops
are branchless: exceptional cases (infinity inputs, P == Q, P == -Q) are
resolved with lane-wise selects, which is both constant-time (reference
flags a timing side channel in its own impl, README.md:144-152) and the
natural SIMD formulation for the VPU.

Formulas: dbl-2009-l doubling (a = 0) / dbl-2007-bl (generic a, the MNT
cycle curves), add-2007-bl addition, madd-2007-bl mixed addition.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class CurveKernel:
    """Batched Jacobian group ops over field kernel ``fk``."""

    def __init__(self, fk, name="G", mul_by_a=None, a_tag=""):
        """mul_by_a: optional x -> a*x map in the coordinate field (the
        curve's a-coefficient; None means a = 0). a_tag: stable hash key
        for the map (kernels are jit-cache keys)."""
        self.fk = fk
        self.name = name
        self.mul_by_a = mul_by_a
        self.a_tag = a_tag

    def __hash__(self):
        return hash((self.name, self.fk, self.a_tag))

    def __eq__(self, o):
        return (isinstance(o, CurveKernel) and o.name == self.name
                and o.fk == self.fk and o.a_tag == self.a_tag)

    # -- constructors ---------------------------------------------------------
    def zero(self, batch_shape):
        one = self.fk.one(batch_shape)
        return (one, one, self.fk.zeros(batch_shape))

    def is_zero(self, P):
        return self.fk.is_zero(P[2])

    def select(self, cond, P, Q):
        return tuple(self.fk.select(cond, a, b) for a, b in zip(P, Q))

    def neg(self, P):
        return (P[0], self.fk.neg(P[1]), P[2])

    # -- group law ------------------------------------------------------------
    # On TPU backends the G1 (plain-Fp) ops dispatch to fused Pallas
    # kernels (ops/pallas_ec.py): one launch per group op instead of
    # ~100 tiny XLA ops (launch overhead dominates at MSM batch sizes).

    # Schedules below group independent field products into stacked
    # single-call-site muls (fk.stack/unstack): XLA's HLO-pass cost
    # scales with call-site count, and the group law's product graph is
    # 3-6 wide -- the stacked forms cold-compile ~4x faster with
    # identical math (dbl-2009-l / dbl-2007-bl / add-2007-bl /
    # madd-2007-bl, unchanged).

    def dbl(self, P):
        """Jacobian doubling. a=0: dbl-2009-l; generic a: dbl-2007-bl
        with M = 3*XX + a*ZZ^2. Uniform: handles Z=0."""
        from .pallas_ec import ec_pallas_ok, dbl as _pdbl
        fk = self.fk
        if self.mul_by_a is not None:
            X, Y, Z = P
            s1 = fk.stack([X, Y, Z])
            XX, YY, ZZ = fk.unstack(fk.mul(s1, s1))
            s2 = fk.stack([YY, fk.add(X, YY), ZZ, fk.add(Y, Z)])
            YYYY, t, ZZ2, w = fk.unstack(fk.mul(s2, s2))
            S = fk.double(fk.sub(fk.sub(t, XX), YYYY))
            M = fk.add(fk.add(fk.add(XX, XX), XX), self.mul_by_a(ZZ2))
            X3 = fk.sub(fk.sqr(M), fk.double(S))
            Y3 = fk.sub(fk.mul(M, fk.sub(S, X3)),
                        fk.double(fk.double(fk.double(YYYY))))
            Z3 = fk.sub(fk.sub(w, YY), ZZ)
            return (X3, Y3, Z3)
        if ec_pallas_ok(self.fk):
            return _pdbl(self.fk, P)
        X, Y, Z = P
        r1 = fk.mul(fk.stack([X, Y, Y]), fk.stack([X, Y, Z]))
        A, B, YZ = fk.unstack(r1)
        XB = fk.add(X, B)
        r2 = fk.mul(fk.stack([B, XB]), fk.stack([B, XB]))
        C, t = fk.unstack(r2)
        D = fk.double(fk.sub(fk.sub(t, A), C))
        E = fk.add(fk.add(A, A), A)
        F = fk.sqr(E)
        X3 = fk.sub(F, fk.double(D))
        eight_c = fk.double(fk.double(fk.double(C)))
        Y3 = fk.sub(fk.mul(E, fk.sub(D, X3)), eight_c)
        Z3 = fk.double(YZ)
        return (X3, Y3, Z3)

    def dbl_n(self, P, n: int):
        """n successive doublings; ONE fused kernel on TPU."""
        from .pallas_ec import ec_pallas_ok, dbl as _pdbl
        if self.mul_by_a is None and ec_pallas_ok(self.fk):
            return _pdbl(self.fk, P, reps=n)
        return jax.lax.fori_loop(0, n, lambda _, a: self.dbl(a), P)

    def add(self, P, Q):
        """Complete Jacobian addition via add-2007-bl + selects."""
        from .pallas_ec import ec_pallas_ok, add as _padd
        if self.mul_by_a is None and ec_pallas_ok(self.fk):
            return _padd(self.fk, P, Q)
        fk = self.fk
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        r1 = fk.mul(fk.stack([Z1, Z2, Y1, Y2]),
                    fk.stack([Z1, Z2, Z2, Z1]))
        Z1Z1, Z2Z2, Y1Z2, Y2Z1 = fk.unstack(r1)
        r2 = fk.mul(fk.stack([X1, X2, Y1Z2, Y2Z1]),
                    fk.stack([Z2Z2, Z1Z1, Z2Z2, Z1Z1]))
        U1, U2, S1, S2 = fk.unstack(r2)
        H = fk.sub(U2, U1)
        H2 = fk.double(H)
        rr = fk.double(fk.sub(S2, S1))
        Zs = fk.add(Z1, Z2)
        r3 = fk.mul(fk.stack([H2, rr, Zs]), fk.stack([H2, rr, Zs]))
        I, rr2, w = fk.unstack(r3)
        r4 = fk.mul(fk.stack([H, U1]), fk.stack([I, I]))
        J, V = fk.unstack(r4)
        X3 = fk.sub(fk.sub(rr2, J), fk.double(V))
        r5 = fk.mul(fk.stack([rr, S1, fk.sub(fk.sub(w, Z1Z1), Z2Z2)]),
                    fk.stack([fk.sub(V, X3), J, H]))
        m1, m2, Z3 = fk.unstack(r5)
        Y3 = fk.sub(m1, fk.double(m2))
        return self._fixup_add(P, Q, (X3, Y3, Z3), H, rr)

    def _fixup_add(self, P, Q, R, H, rr):
        fk = self.fk
        p_inf = self.is_zero(P)
        q_inf = self.is_zero(Q)
        same_x = fk.is_zero(H)
        same_y = fk.is_zero(rr)
        is_double = jnp.logical_and(jnp.logical_and(same_x, same_y),
                                    jnp.logical_not(jnp.logical_or(p_inf, q_inf)))
        # default formula result (gives Z3=0 when H=0, i.e. infinity for P=-Q)
        out = R
        out = self._dbl_repair(is_double, P, out)
        out = self.select(q_inf, P, out)
        out = self.select(p_inf, Q, out)
        return out

    def _dbl_repair(self, need, P, out):
        """Select dbl(P) into `need` lanes, under a lax.cond so the
        doubling (~8 extra field muls/lane, ~40% of an add) only runs
        when some lane actually hit the P == Q case -- never, for
        random MSM inputs."""
        def fix(args):
            P_, out_ = args
            return self.select(need, self.dbl(P_), out_)

        return jax.lax.cond(jnp.any(need), fix, lambda a: a[1], (P, out))

    def madd(self, P, Q_aff, valid=None):
        """Mixed addition: Q given in affine (X2, Y2), Z2 = 1 (madd-2007-bl).

        Q_aff may also carry an explicit infinity mask as third element.
        valid: optional batch bool mask; lanes with valid=False keep P
        (folded into the fused kernel on TPU -- the MSM rake's select).
        """
        from .pallas_ec import ec_pallas_ok, madd as _pmadd
        if (self.mul_by_a is None and ec_pallas_ok(self.fk)
                and len(Q_aff) == 3):
            return _pmadd(self.fk, P, Q_aff, valid)
        fk = self.fk
        X1, Y1, Z1 = P
        if len(Q_aff) == 3:
            X2, Y2, q_inf = Q_aff
        else:
            (X2, Y2), q_inf = Q_aff, None
        r1 = fk.mul(fk.stack([Z1, Y2]), fk.stack([Z1, Z1]))
        Z1Z1, Y2Z1 = fk.unstack(r1)
        r2 = fk.mul(fk.stack([X2, Y2Z1]), fk.stack([Z1Z1, Z1Z1]))
        U2, S2 = fk.unstack(r2)
        H = fk.sub(U2, X1)
        rr = fk.double(fk.sub(S2, Y1))
        r3 = fk.mul(fk.stack([H, rr]), fk.stack([H, rr]))
        HH, rr2 = fk.unstack(r3)
        I = fk.double(fk.double(HH))
        ZH = fk.add(Z1, H)
        r4 = fk.mul(fk.stack([H, X1, ZH]), fk.stack([I, I, ZH]))
        J, V, w = fk.unstack(r4)
        X3 = fk.sub(fk.sub(rr2, J), fk.double(V))
        r5 = fk.mul(fk.stack([rr, Y1]), fk.stack([fk.sub(V, X3), J]))
        m1, m2 = fk.unstack(r5)
        Y3 = fk.sub(m1, fk.double(m2))
        Z3 = fk.sub(fk.sub(w, Z1Z1), HH)
        out = (X3, Y3, Z3)

        p_inf = self.is_zero(P)
        same_x = fk.is_zero(H)
        same_y = fk.is_zero(rr)
        is_double = jnp.logical_and(jnp.logical_and(same_x, same_y),
                                    jnp.logical_not(p_inf))
        out = self._dbl_repair(is_double, P, out)
        # P = inf -> lift Q to Jacobian
        q_jac = (X2, Y2, fk.one(self._batch_shape(X2)))
        out = self.select(p_inf, q_jac, out)
        if q_inf is not None:
            out = self.select(q_inf, P, out)
        if valid is not None:
            out = self.select(valid, out, P)
        return out

    def aadd(self, P_aff, Q_aff):
        """Affine + affine -> Jacobian (mmadd-2007-bl, Z1 = Z2 = 1):
        6 field muls vs ~11 for madd. Both operands are (x, y, inf)
        affine triples -- the MSM bucket tree's level-0 shape."""
        from .pallas_ec import ec_pallas_ok, aadd as _paadd
        if self.mul_by_a is None and ec_pallas_ok(self.fk):
            return _paadd(self.fk, P_aff, Q_aff)
        fk = self.fk
        x1, y1, i1 = P_aff
        x2, y2, i2 = Q_aff
        H = fk.sub(x2, x1)
        rr = fk.double(fk.sub(y2, y1))
        r1 = fk.mul(fk.stack([H, rr]), fk.stack([H, rr]))
        HH, rr2 = fk.unstack(r1)
        I = fk.double(fk.double(HH))
        r2 = fk.mul(fk.stack([H, x1]), fk.stack([I, I]))
        J, V = fk.unstack(r2)
        X3 = fk.sub(fk.sub(rr2, J), fk.double(V))
        r3 = fk.mul(fk.stack([rr, y1]), fk.stack([fk.sub(V, X3), J]))
        m1, m2 = fk.unstack(r3)
        Y3 = fk.sub(m1, fk.double(m2))
        Z3 = fk.double(H)
        out = (X3, Y3, Z3)

        one = fk.one(self._batch_shape(x1))
        need = jnp.logical_and(
            jnp.logical_and(fk.is_zero(H), fk.is_zero(rr)),
            jnp.logical_not(jnp.logical_or(i1, i2)))
        out = self._dbl_repair(need, (x1, y1, one), out)
        # i2 -> lift P1; i1 -> lift P2; both -> infinity
        out = self.select(i2, (x1, y1, one), out)
        out = self.select(i1, (x2, y2, one), out)
        both = jnp.logical_and(i1, i2)
        out = (out[0], out[1],
               fk.select(both, fk.zeros(self._batch_shape(x1)), out[2]))
        return out

    def _batch_shape(self, arr):
        lead = 1 if not hasattr(self.fk, "fp") else 2
        return arr.shape[lead:]

    # -- conversions -------------------------------------------------------------
    def to_affine(self, P):
        """Batch-normalize to affine; returns (x, y, is_inf_mask)."""
        fk = self.fk
        X, Y, Z = P
        inf = fk.is_zero(Z)
        # avoid 0-inverse: substitute 1 where infinite
        zsafe = fk.select(inf, fk.one(self._batch_shape(Z)), Z)
        zi = fk.inv(zsafe)
        zi2 = fk.sqr(zi)
        zi3 = fk.mul(zi2, zi)
        return (fk.mul(X, zi2), fk.mul(Y, zi3), inf)

    def scalar_mul_const(self, P, k: int):
        """P * k for python-int constant k (test/reference use).

        lax.scan over the bit string (MSB first) instead of a Python
        unroll: the traced graph is ONE dbl+add body regardless of
        k.bit_length() (the unrolled form cost minutes of tracing per
        call at 64+ bits)."""
        if k == 0:
            return self.zero(self._batch_shape(P[0]))
        if k.bit_length() == 1:
            return P
        import jax
        import jax.numpy as jnp
        from jax import lax
        bits = jnp.asarray(
            [bool((k >> i) & 1)
             for i in range(k.bit_length() - 2, -1, -1)])

        def body(acc, b):
            acc = self.dbl(acc)
            added = self.add(acc, P)
            acc = jax.tree_util.tree_map(
                lambda a, c: jnp.where(b, c, a), acc, added)
            return acc, None

        acc, _ = lax.scan(body, P, bits)
        return acc

    # -- host conversions -----------------------------------------------------------
    def encode_points(self, pts, jacobian=True):
        """Host ECPoints -> device arrays.

        Returns Jacobian (X, Y, Z) with Z=0 for infinity, or affine
        (x, y, inf_mask) when jacobian=False.
        """
        fk = self.fk
        F = pts[0].group.F if pts else None
        xs, ys, infs = [], [], []
        for p in pts:
            if p.is_zero():
                xs.append(F.one() if hasattr(F, "one") else 1)
                ys.append(F.one() if hasattr(F, "one") else 1)
                infs.append(True)
            else:
                xs.append(p.x)
                ys.append(p.y)
                infs.append(False)
        if hasattr(fk, "fp"):  # Fp2
            X = jnp.asarray(fk.encode(xs))
            Y = jnp.asarray(fk.encode(ys))
        else:
            X = jnp.asarray(fk.encode([int(x) for x in xs]))
            Y = jnp.asarray(fk.encode([int(y) for y in ys]))
        infm = jnp.asarray(np.array(infs))
        if not jacobian:
            return (X, Y, infm)
        one = fk.one((len(pts),))
        Z = fk.select(infm, fk.zeros((len(pts),)), one)
        return (X, Y, Z)

    def decode_points(self, P, group):
        """Device Jacobian points -> list of host ECPoints in ``group``."""
        x, y, inf = self.to_affine(P)
        inf = np.asarray(inf).reshape(-1)
        if hasattr(self.fk, "fp"):  # extension coordinates (Fp2 / Fp3)
            xs = [np.ravel(c) for c in self.fk.decode(x)]
            ys = [np.ravel(c) for c in self.fk.decode(y)]
            F = group.F
            pts = []
            for j in range(len(inf)):
                if inf[j]:
                    pts.append(group.zero())
                else:
                    pts.append(group.point(F(*(int(c[j]) for c in xs)),
                                           F(*(int(c[j]) for c in ys))))
            return pts
        xs = np.ravel(self.fk.decode(x))
        ys = np.ravel(self.fk.decode(y))
        return [group.zero() if inf[j] else group.point(int(xs[j]), int(ys[j]))
                for j in range(len(inf))]
