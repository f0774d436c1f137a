"""Fused Pallas TPU kernels for Jacobian group ops over Fp (G1).

Measured on the v5e tunnel (2026-08): per-launch overhead ~0.8ms vs
~23us of actual CIOS compute per multiply -- a jnp-composed madd
(~19 muls + ~40 adds as separate XLA ops) costs ~50-100ms per MSM rake
round. These kernels run the ENTIRE group operation (all field muls,
adds, exceptional-case selects, and the rake validity mask) inside one
Pallas kernel: one launch per group op.

Formulas mirror ops/ec.py exactly (dbl-2009-l, madd-2007-bl,
add-2007-bl, a = 0), with the same branchless select semantics.
G2 (Fp2 coordinates) stays on the jnp path for now.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs
from .pallas_fp import _mul_body, pallas_enabled

_BLOCK = 512


# --------------------------------------------------------------- field helpers
# All operate on (N, L) uint32 canonical values as python lists-of-rows
# are avoided; jnp arrays throughout. p_list: python-int limb constants.

def _carry(cols, out_len):
    outs = []
    c = jnp.zeros_like(cols[0])
    for k in range(len(cols)):
        v = cols[k] + c
        outs.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    while len(outs) < out_len:
        outs.append(c & LIMB_MASK)
        c = c >> LIMB_BITS
    return outs[:out_len]


def _cond_sub_p(res, p_list):
    """res: list of N+1 limb rows < 2p -> N rows < p."""
    N = len(p_list)
    p_ext = list(p_list) + [0]
    borrow = jnp.zeros_like(res[0], dtype=jnp.int32)
    diff = []
    for k in range(N + 1):
        d = res[k].astype(jnp.int32) - p_ext[k] - borrow
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    keep = borrow != 0
    return [jnp.where(keep, res[k], diff[k]) for k in range(N)]


def _fadd(a, b, p_list):
    N = len(p_list)
    cols = [a[k] + b[k] for k in range(N)]          # lazy < 2^17
    return jnp.stack(_cond_sub_p(_carry(cols, N + 1), p_list))


def _fsub(a, b, p_list):
    N = len(p_list)
    borrow = jnp.zeros_like(a[0], dtype=jnp.int32)
    diff = []
    for k in range(N):
        d = a[k].astype(jnp.int32) - b[k].astype(jnp.int32) - borrow
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    # if borrowed, add p back
    under = borrow != 0
    cols = [diff[k] + jnp.where(under, jnp.uint32(p_list[k]),
                                jnp.uint32(0)) for k in range(N)]
    return jnp.stack(_carry(cols, N))


def _fdouble(a, p_list):
    return _fadd(a, a, p_list)


def _fzero_mask(a):
    """(L,) bool: a == 0 across limbs."""
    m = a[0] == 0
    for k in range(1, a.shape[0]):
        m = jnp.logical_and(m, a[k] == 0)
    return m


def _fselect(cond, a, b):
    return jnp.where(cond[None], a, b)


class _F:
    """Field-op bundle bound to (p_list, n0inv, N) for kernel bodies."""

    def __init__(self, p_list, n0inv):
        self.p_list = p_list
        self.n0inv = n0inv
        self.N = len(p_list)

    def mul(self, a, b):
        return _mul_body(a, b, self.p_list, self.n0inv, self.N)

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return _fadd(a, b, self.p_list)

    def sub(self, a, b):
        return _fsub(a, b, self.p_list)

    def dbl(self, a):
        return _fdouble(a, self.p_list)

    def one(self, like):
        R_mod_p = self._one_val
        return jnp.stack([jnp.full_like(like[0], v) for v in R_mod_p])

    def zero(self, like):
        return jnp.zeros_like(like)


def _ec_dbl(F, X, Y, Z):
    """dbl-2009-l; uniform over Z=0."""
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    t = F.sqr(F.add(X, B))
    D = F.dbl(F.sub(F.sub(t, A), C))
    E = F.add(F.add(A, A), A)
    Fq = F.sqr(E)
    X3 = F.sub(Fq, F.dbl(D))
    eight_c = F.dbl(F.dbl(F.dbl(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), eight_c)
    Z3 = F.dbl(F.mul(Y, Z))
    return X3, Y3, Z3


def _ec_madd(F, X1, Y1, Z1, X2, Y2, q_inf, valid):
    """madd-2007-bl + exceptional-case selects + rake validity mask."""
    Z1Z1 = F.sqr(Z1)
    U2 = F.mul(X2, Z1Z1)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, X1)
    HH = F.sqr(H)
    I = F.dbl(F.dbl(HH))
    J = F.mul(H, I)
    rr = F.dbl(F.sub(S2, Y1))
    V = F.mul(X1, I)
    X3 = F.sub(F.sub(F.sqr(rr), J), F.dbl(V))
    Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.dbl(F.mul(Y1, J)))
    Z3 = F.sub(F.sub(F.sqr(F.add(Z1, H)), Z1Z1), HH)

    p_inf = _fzero_mask(Z1)
    same_x = _fzero_mask(H)
    same_y = _fzero_mask(rr)
    is_dbl = jnp.logical_and(jnp.logical_and(same_x, same_y),
                             jnp.logical_not(p_inf))
    dX, dY, dZ = _ec_dbl(F, X1, Y1, Z1)
    X3 = _fselect(is_dbl, dX, X3)
    Y3 = _fselect(is_dbl, dY, Y3)
    Z3 = _fselect(is_dbl, dZ, Z3)
    # P = inf -> lift Q to Jacobian (Z = R mod p, Montgomery one)
    oneZ = F.one(Z1)
    X3 = _fselect(p_inf, X2, X3)
    Y3 = _fselect(p_inf, Y2, Y3)
    Z3 = _fselect(p_inf, oneZ, Z3)
    # Q = inf -> keep P
    skip = jnp.logical_or(q_inf, jnp.logical_not(valid))
    X3 = _fselect(skip, X1, X3)
    Y3 = _fselect(skip, Y1, Y3)
    Z3 = _fselect(skip, Z1, Z3)
    return X3, Y3, Z3


def _ec_add(F, X1, Y1, Z1, X2, Y2, Z2):
    """add-2007-bl + exceptional-case selects (both inputs Jacobian)."""
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    H = F.sub(U2, U1)
    I = F.sqr(F.dbl(H))
    J = F.mul(H, I)
    rr = F.dbl(F.sub(S2, S1))
    V = F.mul(U1, I)
    X3 = F.sub(F.sub(F.sqr(rr), J), F.dbl(V))
    Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.dbl(F.mul(S1, J)))
    Z3 = F.mul(F.sub(F.sub(F.sqr(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)

    p_inf = _fzero_mask(Z1)
    q_inf = _fzero_mask(Z2)
    same_x = _fzero_mask(H)
    same_y = _fzero_mask(rr)
    is_dbl = jnp.logical_and(
        jnp.logical_and(same_x, same_y),
        jnp.logical_not(jnp.logical_or(p_inf, q_inf)))
    dX, dY, dZ = _ec_dbl(F, X1, Y1, Z1)
    X3 = _fselect(is_dbl, dX, X3)
    Y3 = _fselect(is_dbl, dY, Y3)
    Z3 = _fselect(is_dbl, dZ, Z3)
    X3 = _fselect(q_inf, X1, X3)
    Y3 = _fselect(q_inf, Y1, Y3)
    Z3 = _fselect(q_inf, Z1, Z3)
    X3 = _fselect(p_inf, X2, X3)
    Y3 = _fselect(p_inf, Y2, Y3)
    Z3 = _fselect(p_inf, Z2, Z3)
    return X3, Y3, Z3


# ------------------------------------------------------------------- builders

def _make_F(fk):
    F = _F(tuple(int(v) for v in int_to_limbs(fk.p, fk.N)), fk.n0inv)
    F._one_val = tuple(int(v) for v in fk.one_mont_np)
    return F


@functools.lru_cache(maxsize=None)
def _build_madd(p: int, N: int, n0inv: int, one_mont: tuple, L: int):
    from jax.experimental import pallas as pl
    F = _F(tuple(int(v) for v in int_to_limbs(p, N)), n0inv)
    F._one_val = one_mont

    def kernel(x1, y1, z1, x2, y2, qi, va, ox, oy, oz):
        X3, Y3, Z3 = _ec_madd(F, x1[...], y1[...], z1[...],
                              x2[...], y2[...],
                              qi[...][0] != 0, va[...][0] != 0)
        ox[...], oy[...], oz[...] = X3, Y3, Z3

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((N, block), lambda i: (0, i))
    ms = pl.BlockSpec((1, block), lambda i: (0, i))
    shp = jax.ShapeDtypeStruct((N, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, z1, x2, y2, qi, va):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp), grid=(L // block,),
            in_specs=[fs, fs, fs, fs, fs, ms, ms],
            out_specs=(fs, fs, fs),
        )(x1, y1, z1, x2, y2, qi, va)

    return call


@functools.lru_cache(maxsize=None)
def _build_add(p: int, N: int, n0inv: int, one_mont: tuple, L: int):
    from jax.experimental import pallas as pl
    F = _F(tuple(int(v) for v in int_to_limbs(p, N)), n0inv)
    F._one_val = one_mont

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        X3, Y3, Z3 = _ec_add(F, x1[...], y1[...], z1[...],
                             x2[...], y2[...], z2[...])
        ox[...], oy[...], oz[...] = X3, Y3, Z3

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((N, block), lambda i: (0, i))
    shp = jax.ShapeDtypeStruct((N, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, z1, x2, y2, z2):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp), grid=(L // block,),
            in_specs=[fs] * 6, out_specs=(fs, fs, fs),
        )(x1, y1, z1, x2, y2, z2)

    return call


@functools.lru_cache(maxsize=None)
def _build_dbl(p: int, N: int, n0inv: int, one_mont: tuple, L: int,
               reps: int):
    from jax.experimental import pallas as pl
    F = _F(tuple(int(v) for v in int_to_limbs(p, N)), n0inv)
    F._one_val = one_mont

    def kernel(x1, y1, z1, ox, oy, oz):
        X, Y, Z = x1[...], y1[...], z1[...]
        for _ in range(reps):
            X, Y, Z = _ec_dbl(F, X, Y, Z)
        ox[...], oy[...], oz[...] = X, Y, Z

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((N, block), lambda i: (0, i))
    shp = jax.ShapeDtypeStruct((N, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, z1):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp), grid=(L // block,),
            in_specs=[fs] * 3, out_specs=(fs, fs, fs),
        )(x1, y1, z1)

    return call


# -------------------------------------------------------------------- wrappers

def _flatten(fk, arrs, mask_arrs=()):
    """(N, *batch) field arrays + (*batch,) masks -> padded (N, L)/(1, L)."""
    N = fk.N
    batch = arrs[0].shape[1:]
    L = int(np.prod(batch)) if batch else 1
    pad = (-L) % 128
    Lp = L + pad
    if Lp > _BLOCK and Lp % _BLOCK:
        Lp += (-Lp) % _BLOCK
    outs = []
    for a in arrs:
        a2 = jnp.broadcast_to(a, (N,) + batch).reshape(N, L)
        if Lp != L:
            a2 = jnp.pad(a2, ((0, 0), (0, Lp - L)))
        outs.append(a2)
    for m in mask_arrs:
        m2 = jnp.broadcast_to(m, batch).reshape(1, L).astype(jnp.uint32)
        if Lp != L:
            m2 = jnp.pad(m2, ((0, 0), (0, Lp - L)))
        outs.append(m2)
    return outs, batch, L, Lp


def _unflatten(fk, outs, batch, L):
    return tuple(o[:, :L].reshape((fk.N,) + batch) for o in outs)


def _key(fk):
    return (fk.p, fk.N, fk.n0inv, tuple(int(v) for v in fk.one_mont_np))


def madd(fk, P, Q_aff, valid=None):
    X1, Y1, Z1 = P
    X2, Y2, q_inf = Q_aff
    batch = X1.shape[1:]
    if valid is None:
        valid = jnp.ones(batch, bool)
    flat, batch, L, Lp = _flatten(
        fk, (X1, Y1, Z1, X2, Y2), (q_inf, valid))
    p, N, n0, onem = _key(fk)
    outs = _build_madd(p, N, n0, onem, Lp)(*flat)
    return _unflatten(fk, outs, batch, L)


def add(fk, P, Q):
    flat, batch, L, Lp = _flatten(fk, (*P, *Q))
    p, N, n0, onem = _key(fk)
    outs = _build_add(p, N, n0, onem, Lp)(*flat)
    return _unflatten(fk, outs, batch, L)


def dbl(fk, P, reps: int = 1):
    flat, batch, L, Lp = _flatten(fk, P)
    p, N, n0, onem = _key(fk)
    outs = _build_dbl(p, N, n0, onem, Lp, reps)(*flat)
    return _unflatten(fk, outs, batch, L)


def ec_pallas_ok(fk) -> bool:
    """Fused G1 kernels: TPU backend + plain-Fp coordinates only."""
    return pallas_enabled() and not hasattr(fk, "fp")
