"""Probe: CIOS Montgomery-mul kernel-body variants on the real chip.

The fused bucket kernel's madd body is ~11 Montgomery muls per lane;
_mul_body (pallas_fp) spends most of its adds on full-height
zero-padded accumulator updates (_add_at adds 34 rows where ~17 carry
information). This probe times, inside ONE pallas kernel looping K
times over a (N, L) tile:

  v1  current _mul_body (flat 2N+2-row accumulator, _add_at concats)
  v2  sliding-window CIOS: live (N+2)-row window, static-slice concat
      updates, ~53 row-adds/step instead of ~170
  v2s v2 squaring specialization (skip redundant cross products)

Exactness of each variant is checked against the host oracle before
timing. usage: probe_cios.py [K] [L]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax
import jax.numpy as jnp
import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_tpu"
                               if jax.default_backend() == "tpu"
                               else ".jax_cache_local"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from jax.experimental import pallas as pl

from libsnark_tpu import get_curve
from libsnark_tpu.ops.limbs import LIMB_BITS, LIMB_MASK, int_to_limbs
from libsnark_tpu.ops.pallas_fp import (_mul_body, _carry_rows, _rows,
                                        _cond_sub_rows)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

curve = get_curve("alt_bn128")
p = curve.q
N = 16
n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
p_np = np.asarray(int_to_limbs(p, N)).reshape(N, 1)
print(f"# backend={jax.default_backend()} K={K} L={L}", flush=True)


def _mul_body_v2(a, b, p_col, n0inv, N):
    """Sliding-window CIOS: live window w of N+2 rows; per step the
    a_i*b and u*p contributions land on rows 0..N via two (N+1)-row
    adds; row 0 (== 0 mod 2^16 after the u*p fold) is dropped and its
    carry folded into row 1. Rows stay < ~2^22 (16 * 2^18)."""
    zero1 = jnp.zeros((1,) + a.shape[1:], jnp.uint32)
    w = jnp.zeros((N + 2,) + a.shape[1:], jnp.uint32)
    for i in range(N):
        prod = a[i:i + 1] * b                       # (N, L) exact u32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        c1 = (jnp.concatenate([lo, zero1], 0)
              + jnp.concatenate([zero1, hi], 0))    # (N+1, L) < 2^17
        t0 = w[0:1] + c1[0:1]
        u = ((t0 & LIMB_MASK) * n0inv) & LIMB_MASK  # (1, L)
        pr = u * p_col                              # (N, L) exact u32
        plo = pr & LIMB_MASK
        phi = pr >> LIMB_BITS
        c2 = (jnp.concatenate([plo, zero1], 0)
              + jnp.concatenate([zero1, phi], 0))   # (N+1, L)
        wn = w[0:N + 1] + c1 + c2                   # rows 0..N
        carry0 = wn[0:1] >> LIMB_BITS
        w = jnp.concatenate(
            [wn[1:2] + carry0, wn[2:N + 1], w[N + 1:N + 2], zero1], 0)
    res = _carry_rows(_rows(w), N + 1)
    return _cond_sub_rows(res, p_col, N)


def build(body, name):
    def kernel(p_ref, a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        def step(_, ab):
            a, b = ab
            return body(a, b, p_ref[...], n0inv, N), a
        a, b = jax.lax.fori_loop(0, K, step, (a, b))
        o_ref[...] = a

    spec = pl.BlockSpec((N, L), lambda: (0, 0))
    pspec = pl.BlockSpec((N, 1), lambda: (0, 0))

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((N, L), jnp.uint32),
            in_specs=[pspec, spec, spec], out_specs=spec,
        )(p_np, a, b)
    return call


def host_check(body):
    """1-step exactness vs python ints (Montgomery product a*b*R^-1)."""
    rng = np.random.default_rng(7)
    import math
    a_int = [int(rng.integers(0, 1 << 62)) % p for _ in range(4)]
    b_int = [int(rng.integers(0, 1 << 62)) % p for _ in range(4)]
    a = np.zeros((N, 4), np.uint32)
    b = np.zeros((N, 4), np.uint32)
    for j in range(4):
        a[:, j] = int_to_limbs(a_int[j], N)
        b[:, j] = int_to_limbs(b_int[j], N)
    Rinv = pow(1 << (LIMB_BITS * N), -1, p)

    def one(a, b):
        return body(a, b, jnp.asarray(p_np), n0inv, N)
    out = np.asarray(jax.jit(one)(jnp.asarray(a), jnp.asarray(b)))
    for j in range(4):
        got = sum(int(out[k, j]) << (LIMB_BITS * k) for k in range(N))
        want = a_int[j] * b_int[j] * Rinv % p
        assert got == want, (j, got, want)


host_check(_mul_body)
host_check(_mul_body_v2)
print("# exactness ok (host oracle)", flush=True)

rng = np.random.default_rng(0)
a0 = jnp.asarray(rng.integers(0, 1 << 16, (N, L), dtype=np.uint32))
b0 = jnp.asarray(rng.integers(0, 1 << 16, (N, L), dtype=np.uint32))
# reduce below p: cheap — mask top limb
a0 = a0.at[N - 1].set(a0[N - 1] & 0x2FFF)
b0 = b0.at[N - 1].set(b0[N - 1] & 0x2FFF)

for name, body in [("v1 current", _mul_body), ("v2 sliding", _mul_body_v2)]:
    fn = build(body, name)
    np.asarray(fn(a0, b0))           # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(a0, b0))
        best = min(best, time.perf_counter() - t0)
    per = best / (K * L)
    print(f"{name:12s} {best*1e3:8.2f} ms  {per*1e9:8.2f} ns/mul-lane "
          f"({1/per/1e6:.1f} M mul/s)", flush=True)
