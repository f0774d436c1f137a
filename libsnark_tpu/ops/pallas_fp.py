"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp scan-based FpKernel.mul costs ~50 tiny kernel dispatches per
multiply (~0.35ms on v5e regardless of batch size -- pure per-op
overhead). This kernel runs the whole CIOS pipeline inside ONE
VMEM-resident kernel: one launch per multiply.

v2 (round 2): all hot ops are 2D (N, L) tile ops. The round-1 kernel
processed each limb row as a separate 1D (L,) op -- 1 of 8 sublanes
utilized, measured ~25x off VPU speed-of-light on the madd kernel. The
CIOS limb loop is unrolled with a FLAT (2N+2, L) accumulator and static
slice updates at offset i (no per-step shifts); only the final carry /
conditional-subtract chains remain sequential row ops.

Layout: (N, L) uint32, limbs on sublanes (N=16 -> two 8x128 u32 tiles),
batch on lanes. The wrapper flattens/pads arbitrary trailing batch dims
to a lane count divisible by the block size. The modulus limbs enter as
a real (N, 1) operand (broadcast against the block).

Reference role: libff Fp_model mul -- the TPU speed-of-light path the
design doc (SURVEY.md section 6) budgets around.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK

_BLOCK = 1024          # lanes per grid step


def pallas_enabled() -> bool:
    """Pallas path is TPU-only (CPU lowering of these kernels is the
    interpreter -- slower than the jnp scan path)."""
    flag = os.environ.get("LIBSNARK_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# --------------------------------------------------------------- kernel math
#
# All helpers operate on (N, L) uint32 2D arrays; p_col is an (N, 1)
# uint32 operand. Sequential carry/borrow chains build a python list of
# (1, L) rows and stack once.

def _carry_rows(rows, out_len):
    """Full carry propagation over a list of (1, L) lazy column rows
    (values < ~2^30) -> out_len rows < 2^16."""
    outs = []
    c = jnp.zeros_like(rows[0])
    for r in rows:
        v = r + c
        outs.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    while len(outs) < out_len:
        outs.append(c & LIMB_MASK)
        c = c >> LIMB_BITS
    return outs[:out_len]


def _rows(a):
    """Split (K, L) into K (1, L) rows."""
    return [a[k:k + 1] for k in range(a.shape[0])]


def _cond_sub_rows(res_rows, p_col, N):
    """res_rows: N+1 (1, L) rows, value < 2p -> (N, L) canonical < p."""
    p_rows = [p_col[k:k + 1].astype(jnp.int32) for k in range(N)] + [None]
    borrow = jnp.zeros_like(res_rows[0], dtype=jnp.int32)
    diff = []
    for k in range(N + 1):
        d = res_rows[k].astype(jnp.int32) - borrow
        if p_rows[k] is not None:
            d = d - p_rows[k]
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    keep = borrow != 0                        # res < p -> keep res
    out = [jnp.where(keep, res_rows[k], diff[k]) for k in range(N)]
    return jnp.concatenate(out, axis=0)


def _add_at(acc, off, val):
    """acc[off:off+rows(val)] += val. Mosaic supports neither scatter-add
    nor dynamic_(update_)slice on values; zero-pad placement via concat
    (jnp.pad lowers to an op Mosaic rejects inside fori_loop bodies)."""
    K = acc.shape[0]
    tail = K - off - val.shape[0]
    parts = []
    if off:
        parts.append(jnp.zeros((off,) + val.shape[1:], val.dtype))
    parts.append(val)
    if tail:
        parts.append(jnp.zeros((tail,) + val.shape[1:], val.dtype))
    return acc + (parts[0] if len(parts) == 1
                  else jnp.concatenate(parts, axis=0))


def _mul_body(a, b, p_col, n0inv, N):
    """CIOS Montgomery product on (N, L) canonical operands -> (N, L) < p.

    Flat-accumulator unrolled CIOS: column j of the running value lives
    in acc[j]; after step i folds u_i*p, column i is == 0 mod 2^16 and
    its carry is folded into column i+1. Lazy columns stay < 2^23.
    """
    acc = jnp.zeros((2 * N + 2,) + a.shape[1:], jnp.uint32)
    for i in range(N):
        prod = a[i:i + 1] * b                      # (N, L) exact u32
        acc = _add_at(acc, i, prod & LIMB_MASK)
        acc = _add_at(acc, i + 1, prod >> LIMB_BITS)
        u = ((acc[i:i + 1] & LIMB_MASK) * n0inv) & LIMB_MASK   # (1, L)
        pr = u * p_col                             # (N, L) broadcast
        acc = _add_at(acc, i, pr & LIMB_MASK)
        acc = _add_at(acc, i + 1, pr >> LIMB_BITS)
        acc = _add_at(acc, i + 1, acc[i:i + 1] >> LIMB_BITS)
    res = _carry_rows(_rows(acc[N:2 * N + 2]), N + 1)
    return _cond_sub_rows(res, p_col, N)


def _fadd(a, b, p_col):
    N = p_col.shape[0]
    cols = a + b                                   # (N, L) lazy < 2^17
    res = _carry_rows(_rows(cols), N + 1)
    return _cond_sub_rows(res, p_col, N)


def _fsub(a, b, p_col):
    N = p_col.shape[0]
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    borrow = jnp.zeros((1,) + a.shape[1:], jnp.int32)
    diff = []
    for k in range(N):
        d = ai[k:k + 1] - bi[k:k + 1] - borrow
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    under = borrow != 0                            # (1, L)
    fix = jnp.where(under, p_col, jnp.zeros_like(p_col))   # (N, L)
    cols = jnp.concatenate(diff, axis=0) + fix
    return jnp.concatenate(_carry_rows(_rows(cols), N), axis=0)


def _fzero_mask(a):
    """(1, L) bool: a == 0 across limbs."""
    return jnp.all(a == 0, axis=0, keepdims=True)


def _fselect(cond, a, b):
    """cond: (1, L) bool."""
    return jnp.where(cond, a, b)


class _F:
    """Field-op bundle for kernel bodies; p_col is a traced (N, 1)
    operand, one_col the Montgomery one (N, 1)."""

    def __init__(self, p_col, n0inv, one_col=None):
        self.p_col = p_col
        self.n0inv = n0inv
        self.one_col = one_col
        self.N = p_col.shape[0]

    def mul(self, a, b):
        return _mul_body(a, b, self.p_col, self.n0inv, self.N)

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        return _fadd(a, b, self.p_col)

    def sub(self, a, b):
        return _fsub(a, b, self.p_col)

    def dbl(self, a):
        return _fadd(a, a, self.p_col)

    def one(self, like):
        return jnp.broadcast_to(self.one_col, like.shape).astype(jnp.uint32)

    def zero(self, like):
        return jnp.zeros_like(like)


class _F2:
    """Fp2 field-op bundle for kernel bodies (r5): elements are
    (2N, L) uint32 arrays -- c0 limbs in rows [0, N), c1 in [N, 2N).

    This layout keeps the generic EC formulas (pallas_ec._ec_*)
    unchanged: _fzero_mask over 2N rows IS the Fp2 zero test, (1, L)
    masks broadcast over both coefficient blocks, and lane rolls move
    both coefficients together. Karatsuba stacks its three base-field
    products into ONE CIOS body at 3L lanes (one call site).

    beta (the quadratic non-residue, s^2 = beta) enters as a small
    signed constant: |beta| <= 8 via an addition chain (alt_bn128 -1,
    BLS12-377 -5). Reference role: libff Fp2_model over the G2 twist
    (r1cs_gg_ppzksnark.tcc:544-556 B-query MSM operands).
    """

    def __init__(self, p_col, n0inv, one_col, beta_small, beta_is_neg):
        self.p_col = p_col
        self.n0inv = n0inv
        self.one_col = one_col
        self.N = p_col.shape[0]
        assert 1 <= beta_small <= 8, "addition-chain beta only"
        self.beta_small = beta_small
        self.beta_is_neg = beta_is_neg

    def _nr(self, a):
        """a * beta on a base-field (N, L) block."""
        out = a
        for bit in bin(self.beta_small)[3:]:
            out = _fadd(out, out, self.p_col)
            if bit == "1":
                out = _fadd(out, a, self.p_col)
        if self.beta_is_neg:
            out = _fsub(jnp.zeros_like(out), out, self.p_col)
        return out

    def mul(self, a, b):
        N = self.N
        L = a.shape[-1]
        a0, a1 = a[:N], a[N:]
        b0, b1 = b[:N], b[N:]
        sa = _fadd(a0, a1, self.p_col)
        sb = _fadd(b0, b1, self.p_col)
        A = jnp.concatenate([a0, a1, sa], axis=-1)
        B = jnp.concatenate([b0, b1, sb], axis=-1)
        P = _mul_body(A, B, self.p_col, self.n0inv, N)
        v0, v1, t = P[:, :L], P[:, L:2 * L], P[:, 2 * L:]
        c0 = _fadd(v0, self._nr(v1), self.p_col)
        c1 = _fsub(_fsub(t, v0, self.p_col), v1, self.p_col)
        return jnp.concatenate([c0, c1], axis=0)

    def sqr(self, a):
        # complex squaring: v = a0 a1; u = (a0+a1)(a0+beta a1);
        # c0 = u - v - beta v; c1 = 2v  -- two stacked products
        N = self.N
        L = a.shape[-1]
        a0, a1 = a[:N], a[N:]
        t0 = _fadd(a0, a1, self.p_col)
        t1 = _fadd(a0, self._nr(a1), self.p_col)
        A = jnp.concatenate([a0, t0], axis=-1)
        B = jnp.concatenate([a1, t1], axis=-1)
        P = _mul_body(A, B, self.p_col, self.n0inv, N)
        v, u = P[:, :L], P[:, L:]
        c0 = _fsub(_fsub(u, v, self.p_col), self._nr(v), self.p_col)
        c1 = _fadd(v, v, self.p_col)
        return jnp.concatenate([c0, c1], axis=0)

    def _both(self, f, a, b=None):
        N = self.N
        if b is None:
            return jnp.concatenate([f(a[:N]), f(a[N:])], axis=0)
        return jnp.concatenate([f(a[:N], b[:N]), f(a[N:], b[N:])], axis=0)

    def add(self, a, b):
        return self._both(lambda x, y: _fadd(x, y, self.p_col), a, b)

    def sub(self, a, b):
        return self._both(lambda x, y: _fsub(x, y, self.p_col), a, b)

    def dbl(self, a):
        return self._both(lambda x: _fadd(x, x, self.p_col), a)

    def one(self, like):
        N = self.N
        shape = (N,) + like.shape[1:]
        return jnp.concatenate(
            [jnp.broadcast_to(self.one_col, shape).astype(jnp.uint32),
             jnp.zeros(shape, jnp.uint32)], axis=0)

    def zero(self, like):
        return jnp.zeros_like(like)


# ------------------------------------------------------------------ builders

@functools.lru_cache(maxsize=None)
def _build_mul(p: int, N: int, n0inv: int, L: int):
    """pallas_call for (N, L) x (N, L) -> (N, L); L % block == 0."""
    from jax.experimental import pallas as pl

    def kernel(p_ref, a_ref, b_ref, o_ref):
        o_ref[...] = _mul_body(a_ref[...], b_ref[...], p_ref[...],
                               n0inv, N)

    block = min(_BLOCK, L)
    grid = (L // block,)
    spec = pl.BlockSpec((N, block), lambda i: (0, i))
    pspec = pl.BlockSpec((N, 1), lambda i: (0, 0))

    from .limbs import int_to_limbs
    # numpy, NOT jnp: _build_mul can be first invoked inside an active
    # trace (lru cache miss), where a jnp constant would leak as a tracer
    p_arr = np.asarray(int_to_limbs(p, N)).reshape(N, 1)

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
            grid=grid,
            in_specs=[pspec, spec, spec],
            out_specs=spec,
        )(p_arr, a, b)

    return call


def mont_mul(fk, a, b):
    """Drop-in replacement for FpKernel.mul on TPU backends.

    a, b: (N, *batch) uint32 canonical Montgomery operands."""
    N = fk.N
    batch = a.shape[1:]
    L = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(N, L)
    b2 = jnp.broadcast_to(b, a.shape).reshape(N, L)
    pad = (-L) % 128
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    Lp = L + pad
    if Lp > _BLOCK and Lp % _BLOCK:
        extra = (-Lp) % _BLOCK
        a2 = jnp.pad(a2, ((0, 0), (0, extra)))
        b2 = jnp.pad(b2, ((0, 0), (0, extra)))
        Lp += extra
    out = _build_mul(fk.p, N, fk.n0inv, Lp)(a2, b2)
    return out[:, :L].reshape((N,) + batch)
