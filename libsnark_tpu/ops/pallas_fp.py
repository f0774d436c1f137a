"""Pallas TPU kernel for batched Montgomery multiplication.

The jnp scan-based FpKernel.mul costs ~50 tiny kernel dispatches per
multiply (~0.35ms on v5e regardless of batch size -- pure per-op
overhead; measured via /tmp profiling, 2026-08). This kernel runs the
whole CIOS pipeline -- 16 statically-unrolled limb steps, carry
propagation, conditional subtract -- inside ONE VMEM-resident kernel:
one launch per multiply.

Layout: (N, L) uint32, limbs on sublanes (N=16 -> two 8x128 u32 tiles),
batch on lanes. The wrapper flattens/pads arbitrary trailing batch dims
to a lane count divisible by the block size.

Reference role: libff Fp_model mul -- this is the TPU speed-of-light
path the design doc (SURVEY.md section 6) budgets around.
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


def _mul_body(a, b, p_list, n0inv, N):
    """CIOS on (N, L) values; statically unrolled; returns (N, L) < p.

    p_list: python-int limbs (scalar constants fold into the ops --
    pallas kernels may not capture array constants). Column invariants
    match ops/fp.py (lazy u32 columns < 2^23)."""
    L = a.shape[1]
    acc = [jnp.zeros((L,), jnp.uint32) for _ in range(N + 2)]
    for i in range(N):
        ai = a[i][None]                      # (1, L)
        prod = ai * b                        # (N, L) exact
        lo, hi = prod & LIMB_MASK, prod >> LIMB_BITS
        for j in range(N):
            acc[j] = acc[j] + lo[j]
            acc[j + 1] = acc[j + 1] + hi[j]
        u = ((acc[0] & LIMB_MASK) * n0inv) & LIMB_MASK
        for j in range(N):
            pr = u * p_list[j]               # scalar-constant multiply
            acc[j] = acc[j] + (pr & LIMB_MASK)
            acc[j + 1] = acc[j + 1] + (pr >> LIMB_BITS)
        acc[1] = acc[1] + (acc[0] >> LIMB_BITS)
        acc = acc[1:] + [jnp.zeros((L,), jnp.uint32)]
    # full carry propagation to N+1 limbs
    outs = []
    carry = jnp.zeros((L,), jnp.uint32)
    for k in range(N + 2):
        v = acc[k] + carry
        outs.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    res = outs[: N + 1]
    # conditional subtract p (extended with a zero limb)
    p_ext = list(p_list) + [0]
    borrow = jnp.zeros((L,), jnp.int32)
    diff = []
    for k in range(N + 1):
        d = res[k].astype(jnp.int32) - p_ext[k] - borrow
        borrow = (d < 0).astype(jnp.int32)
        diff.append((d + (borrow << LIMB_BITS)).astype(jnp.uint32))
    keep = borrow != 0                        # res < p -> keep res
    out = [jnp.where(keep, res[k], diff[k]) for k in range(N)]
    return jnp.stack(out, axis=0)


@functools.lru_cache(maxsize=None)
def _build_mul(p: int, N: int, n0inv: int, L: int):
    """pallas_call for (N, L) x (N, L) -> (N, L); L % _BLOCK == 0 or
    L <= _BLOCK with a single block."""
    from jax.experimental import pallas as pl

    from .limbs import int_to_limbs
    p_list = tuple(int(v) for v in int_to_limbs(p, N))

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _mul_body(a_ref[...], b_ref[...], p_list, n0inv, N)

    block = min(_BLOCK, L)
    grid = (L // block,)
    spec = pl.BlockSpec((N, block), lambda i: (0, i))

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

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
