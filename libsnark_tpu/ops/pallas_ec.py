"""Fused Pallas TPU kernels for Jacobian group ops over Fp (G1).

Each group operation (all field muls, adds, exceptional-case selects,
and the bucket-validity mask) runs inside ONE Pallas kernel: one launch
per group op instead of ~100 tiny XLA dispatches.

v2 (round 2): kernel bodies use the 2D (N, L) tile ops from pallas_fp
(the round-1 per-row 1D formulation used 1 of 8 sublanes and measured
~25x off VPU speed-of-light). Modulus and Montgomery-one limbs enter as
(N, 1) operands.

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
from .pallas_fp import (_F, _F2, _fselect, _fzero_mask, pallas_enabled)

_BLOCK = 1024


def _fk_info(fk):
    """(p, N, n0inv, one_mont, ext, beta_small, beta_neg) for a plain
    FpKernel (ext=1) or an Fp2Kernel over a plain base (ext=2). The
    (2N, L) Fp2 layout keeps every formula below unchanged -- _F2
    carries the coefficient split internally (see pallas_fp._F2)."""
    if type(fk).__name__ == "Fp2Kernel":
        fp = fk.fp
        return (fp.p, fp.N, fp.n0inv, tuple(int(v) for v in fp.one_mont_np),
                2, fk.beta_small, bool(fk.beta_is_neg))
    return (fk.p, fk.N, fk.n0inv, tuple(int(v) for v in fk.one_mont_np),
            1, 0, False)


def _make_F(p_ref, one_ref, n0inv, ext, beta_small, beta_neg):
    if ext == 2:
        return _F2(p_ref, n0inv, one_ref, beta_small, beta_neg)
    return _F(p_ref, n0inv, one_ref)


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
    """madd-2007-bl + exceptional-case selects + bucket validity mask.

    q_inf, valid: (1, L) bool."""
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


def _ec_madd_flag(F, X1, Y1, Z1, X2, Y2, q_inf, valid):
    """madd-2007-bl WITHOUT the in-kernel doubling path.

    The P == Q case costs ~8 extra Montgomery muls per lane when folded
    into the kernel (~40% of the madd) yet fires only on colliding
    inputs. Here the kernel returns a (1, L) need-double flag instead;
    the wrapper repairs flagged lanes with the dbl kernel under a
    lax.cond, so the common case never pays for it. Flagged lanes hold
    the raw formula output (Z3 = 2*Z1*H = 0, i.e. infinity) until
    repaired."""
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
    skip = jnp.logical_or(q_inf, jnp.logical_not(valid))
    need_dbl = jnp.logical_and(
        jnp.logical_and(_fzero_mask(H), _fzero_mask(rr)),
        jnp.logical_not(jnp.logical_or(p_inf, skip)))
    # P = inf -> lift Q to Jacobian (Z = R mod p, Montgomery one)
    oneZ = F.one(Z1)
    X3 = _fselect(p_inf, X2, X3)
    Y3 = _fselect(p_inf, Y2, Y3)
    Z3 = _fselect(p_inf, oneZ, Z3)
    # Q = inf / masked -> keep P
    X3 = _fselect(skip, X1, X3)
    Y3 = _fselect(skip, Y1, Y3)
    Z3 = _fselect(skip, Z1, Z3)
    return X3, Y3, Z3, need_dbl


def _ec_add_flag(F, X1, Y1, Z1, X2, Y2, Z2):
    """add-2007-bl without the in-kernel doubling path (see
    _ec_madd_flag)."""
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
    need_dbl = jnp.logical_and(
        jnp.logical_and(_fzero_mask(H), _fzero_mask(rr)),
        jnp.logical_not(jnp.logical_or(p_inf, q_inf)))
    X3 = _fselect(q_inf, X1, X3)
    Y3 = _fselect(q_inf, Y1, Y3)
    Z3 = _fselect(q_inf, Z1, Z3)
    X3 = _fselect(p_inf, X2, X3)
    Y3 = _fselect(p_inf, Y2, Y3)
    Z3 = _fselect(p_inf, Z2, Z3)
    return X3, Y3, Z3, need_dbl


def _ec_aadd_flag(F, X1, Y1, i1, X2, Y2, i2):
    """Affine + affine -> Jacobian (mmadd-2007-bl, Z1 = Z2 = 1): 6 muls
    vs ~11 for madd. Used for level 0 of the MSM bucket tree, where both
    operands are affine rows. i1/i2: (1, L) infinity masks. Returns the
    need-double flag like _ec_madd_flag."""
    H = F.sub(X2, X1)
    rr = F.dbl(F.sub(Y2, Y1))
    HH = F.sqr(H)
    I = F.dbl(F.dbl(HH))
    J = F.mul(H, I)
    V = F.mul(X1, I)
    X3 = F.sub(F.sub(F.sqr(rr), J), F.dbl(V))
    Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.dbl(F.mul(Y1, J)))
    Z3 = F.dbl(H)

    need_dbl = jnp.logical_and(
        jnp.logical_and(_fzero_mask(H), _fzero_mask(rr)),
        jnp.logical_not(jnp.logical_or(i1, i2)))
    one = F.one(X1)
    # i2 -> lift P1; i1 -> lift P2; both -> infinity
    X3 = _fselect(i2, X1, X3)
    Y3 = _fselect(i2, Y1, Y3)
    Z3 = _fselect(i2, one, Z3)
    X3 = _fselect(i1, X2, X3)
    Y3 = _fselect(i1, Y2, Y3)
    Z3 = _fselect(i1, one, Z3)
    both = jnp.logical_and(i1, i2)
    Z3 = _fselect(both, jnp.zeros_like(Z3), Z3)
    return X3, Y3, Z3, need_dbl


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

def _const_operands(p: int, N: int, one_mont: tuple):
    # numpy, NOT jnp: builders can be first invoked inside an active
    # trace, where jnp constants would leak as tracers
    p_arr = np.asarray(int_to_limbs(p, N)).reshape(N, 1)
    one_arr = np.array(one_mont, dtype=np.uint32).reshape(N, 1)
    return p_arr, one_arr


@functools.lru_cache(maxsize=None)
def _build_madd(p: int, N: int, n0inv: int, one_mont: tuple, L: int,
                ext: int = 1, beta_small: int = 0, beta_neg: bool = False):
    from jax.experimental import pallas as pl
    p_arr, one_arr = _const_operands(p, N, one_mont)
    FW = ext * N

    def kernel(p_ref, one_ref, x1, y1, z1, x2, y2, qi, va,
               ox, oy, oz, od):
        F = _make_F(p_ref[...], one_ref[...], n0inv, ext,
                    beta_small, beta_neg)
        X3, Y3, Z3, nd = _ec_madd_flag(F, x1[...], y1[...], z1[...],
                                       x2[...], y2[...],
                                       qi[...] != 0, va[...] != 0)
        ox[...], oy[...], oz[...] = X3, Y3, Z3
        od[...] = nd.astype(jnp.uint32)

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((FW, block), lambda i: (0, i))
    ms = pl.BlockSpec((1, block), lambda i: (0, i))
    cs = pl.BlockSpec((N, 1), lambda i: (0, 0))
    shp = jax.ShapeDtypeStruct((FW, L), jnp.uint32)
    mshp = jax.ShapeDtypeStruct((1, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, z1, x2, y2, qi, va):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp, mshp), grid=(L // block,),
            in_specs=[cs, cs, fs, fs, fs, fs, fs, ms, ms],
            out_specs=(fs, fs, fs, ms),
        )(p_arr, one_arr, x1, y1, z1, x2, y2, qi, va)

    return call


@functools.lru_cache(maxsize=None)
def _build_add(p: int, N: int, n0inv: int, one_mont: tuple, L: int,
               ext: int = 1, beta_small: int = 0, beta_neg: bool = False):
    from jax.experimental import pallas as pl
    p_arr, one_arr = _const_operands(p, N, one_mont)
    FW = ext * N

    def kernel(p_ref, one_ref, x1, y1, z1, x2, y2, z2, ox, oy, oz, od):
        F = _make_F(p_ref[...], one_ref[...], n0inv, ext,
                    beta_small, beta_neg)
        X3, Y3, Z3, nd = _ec_add_flag(F, x1[...], y1[...], z1[...],
                                      x2[...], y2[...], z2[...])
        ox[...], oy[...], oz[...] = X3, Y3, Z3
        od[...] = nd.astype(jnp.uint32)

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((FW, block), lambda i: (0, i))
    ms = pl.BlockSpec((1, block), lambda i: (0, i))
    cs = pl.BlockSpec((N, 1), lambda i: (0, 0))
    shp = jax.ShapeDtypeStruct((FW, L), jnp.uint32)
    mshp = jax.ShapeDtypeStruct((1, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, z1, x2, y2, z2):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp, mshp), grid=(L // block,),
            in_specs=[cs, cs] + [fs] * 6, out_specs=(fs, fs, fs, ms),
        )(p_arr, one_arr, x1, y1, z1, x2, y2, z2)

    return call


@functools.lru_cache(maxsize=None)
def _build_aadd(p: int, N: int, n0inv: int, one_mont: tuple, L: int,
                ext: int = 1, beta_small: int = 0, beta_neg: bool = False):
    from jax.experimental import pallas as pl
    p_arr, one_arr = _const_operands(p, N, one_mont)
    FW = ext * N

    def kernel(p_ref, one_ref, x1, y1, i1, x2, y2, i2, ox, oy, oz, od):
        F = _make_F(p_ref[...], one_ref[...], n0inv, ext,
                    beta_small, beta_neg)
        X3, Y3, Z3, nd = _ec_aadd_flag(F, x1[...], y1[...], i1[...] != 0,
                                       x2[...], y2[...], i2[...] != 0)
        ox[...], oy[...], oz[...] = X3, Y3, Z3
        od[...] = nd.astype(jnp.uint32)

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((FW, block), lambda i: (0, i))
    ms = pl.BlockSpec((1, block), lambda i: (0, i))
    cs = pl.BlockSpec((N, 1), lambda i: (0, 0))
    shp = jax.ShapeDtypeStruct((FW, L), jnp.uint32)
    mshp = jax.ShapeDtypeStruct((1, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, i1, x2, y2, i2):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp, mshp), grid=(L // block,),
            in_specs=[cs, cs, fs, fs, ms, fs, fs, ms],
            out_specs=(fs, fs, fs, ms),
        )(p_arr, one_arr, x1, y1, i1, x2, y2, i2)

    return call


@functools.lru_cache(maxsize=None)
def _build_dbl(p: int, N: int, n0inv: int, one_mont: tuple, L: int,
               reps: int, ext: int = 1, beta_small: int = 0,
               beta_neg: bool = False):
    from jax.experimental import pallas as pl
    p_arr, one_arr = _const_operands(p, N, one_mont)
    FW = ext * N

    def kernel(p_ref, one_ref, x1, y1, z1, ox, oy, oz):
        F = _make_F(p_ref[...], one_ref[...], n0inv, ext,
                    beta_small, beta_neg)
        X, Y, Z = x1[...], y1[...], z1[...]
        for _ in range(reps):
            X, Y, Z = _ec_dbl(F, X, Y, Z)
        ox[...], oy[...], oz[...] = X, Y, Z

    block = min(_BLOCK, L)
    fs = pl.BlockSpec((FW, block), lambda i: (0, i))
    cs = pl.BlockSpec((N, 1), lambda i: (0, 0))
    shp = jax.ShapeDtypeStruct((FW, L), jnp.uint32)

    @jax.jit
    def call(x1, y1, z1):
        return pl.pallas_call(
            kernel, out_shape=(shp, shp, shp), grid=(L // block,),
            in_specs=[cs, cs] + [fs] * 3, out_specs=(fs, fs, fs),
        )(p_arr, one_arr, x1, y1, z1)

    return call


# -------------------------------------------------------------------- wrappers

def _flatten(fk, arrs, mask_arrs=()):
    """Field arrays + (*batch,) masks -> padded (FW, L)/(1, L).

    Plain Fp arrays are (N, *batch); Fp2 arrays are (2, N, *batch) and
    flatten coefficient-major to (2N, L) (the _F2 kernel layout)."""
    _, N, _, _, ext, _, _ = _fk_info(fk)
    lead = (2, N) if ext == 2 else (N,)
    FW = ext * N
    batch = arrs[0].shape[len(lead):]
    L = int(np.prod(batch)) if batch else 1
    pad = (-L) % 128
    Lp = L + pad
    if Lp > _BLOCK and Lp % _BLOCK:
        Lp += (-Lp) % _BLOCK
    outs = []
    for a in arrs:
        a2 = jnp.broadcast_to(a, lead + batch).reshape(FW, L)
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
    _, N, _, _, ext, _, _ = _fk_info(fk)
    lead = (2, N) if ext == 2 else (N,)
    return tuple(o[:, :L].reshape(lead + batch) for o in outs)


def _dbl_repair(fk, P_flat, outs, Lp):
    """Repair need-double lanes flagged by the nodbl kernels: lanes with
    P == Q (as group elements) left the kernel as infinity; a lax.cond
    runs the dbl kernel + select only when some lane actually collided
    (never, for random MSM inputs -- the branch is skipped at runtime).
    P_flat: the padded (FW, Lp) Jacobian triple to double."""
    X3, Y3, Z3, nd = outs
    p, N, n0, onem, ext, bs, bn = _fk_info(fk)

    def fix(args):
        (x1, y1, z1), (X3, Y3, Z3, nd) = args
        dX, dY, dZ = _build_dbl(p, N, n0, onem, Lp, 1, ext, bs, bn)(
            x1, y1, z1)
        m = nd != 0
        return (jnp.where(m, dX, X3), jnp.where(m, dY, Y3),
                jnp.where(m, dZ, Z3))

    return jax.lax.cond(jnp.any(nd != 0), fix, lambda a: a[1][:3],
                        (P_flat, outs))


def madd(fk, P, Q_aff, valid=None):
    X1, Y1, Z1 = P
    X2, Y2, q_inf = Q_aff
    p, N, n0, onem, ext, bs, bn = _fk_info(fk)
    batch = X1.shape[2:] if ext == 2 else X1.shape[1:]
    if valid is None:
        valid = jnp.ones(batch, bool)
    flat, batch, L, Lp = _flatten(
        fk, (X1, Y1, Z1, X2, Y2), (q_inf, valid))
    outs = _build_madd(p, N, n0, onem, Lp, ext, bs, bn)(*flat)
    fixed = _dbl_repair(fk, tuple(flat[:3]), outs, Lp)
    return _unflatten(fk, fixed, batch, L)


def add(fk, P, Q):
    flat, batch, L, Lp = _flatten(fk, (*P, *Q))
    p, N, n0, onem, ext, bs, bn = _fk_info(fk)
    outs = _build_add(p, N, n0, onem, Lp, ext, bs, bn)(*flat)
    fixed = _dbl_repair(fk, tuple(flat[:3]), outs, Lp)
    return _unflatten(fk, fixed, batch, L)


def aadd(fk, P_aff, Q_aff):
    """Affine + affine -> Jacobian: (x, y, inf) x 2 -> (X, Y, Z)."""
    x1, y1, i1 = P_aff
    x2, y2, i2 = Q_aff
    flat, batch, L, Lp = _flatten(fk, (x1, y1), (i1,))
    flat2, _, _, _ = _flatten(fk, (x2, y2), (i2,))
    p, N, n0, onem, ext, bs, bn = _fk_info(fk)
    outs = _build_aadd(p, N, n0, onem, Lp, ext, bs, bn)(*flat, *flat2)
    # repair target: P1 lifted to Jacobian (Z = Montgomery one); padding
    # lanes are flagged never (i1 true there)
    one_np = np.array(onem, np.uint32).reshape(N, 1)
    if ext == 2:
        one_np = np.concatenate(
            [one_np, np.zeros((N, 1), np.uint32)], axis=0)
    oneZ = jnp.broadcast_to(jnp.asarray(one_np), (ext * N, Lp))
    fixed = _dbl_repair(fk, (flat[0], flat[1], oneZ), outs, Lp)
    return _unflatten(fk, fixed, batch, L)


def dbl(fk, P, reps: int = 1):
    flat, batch, L, Lp = _flatten(fk, P)
    p, N, n0, onem, ext, bs, bn = _fk_info(fk)
    outs = _build_dbl(p, N, n0, onem, Lp, reps, ext, bs, bn)(*flat)
    return _unflatten(fk, outs, batch, L)


def ec_pallas_ok(fk) -> bool:
    """Fused kernels: TPU backend + plain-Fp coordinates, or (r5)
    Fp2-over-plain-Fp with a small addition-chain non-residue (the G2
    fields of alt_bn128 / bls12_377; MNT towers stay on the jnp path).
    The a = 0 requirement is enforced by CurveKernel's mul_by_a gate."""
    if not pallas_enabled():
        return False
    if not hasattr(fk, "fp"):
        return True
    return (type(fk).__name__ == "Fp2Kernel"
            and not hasattr(fk.fp, "fp")
            and 1 <= fk.beta_small <= 8)
