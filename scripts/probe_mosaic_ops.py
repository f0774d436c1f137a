"""Probe which layout ops this toolchain's Mosaic lowers, to pick a
fused-MSM kernel design that actually compiles (r4).

Each probe builds a minimal pallas kernel and compiles it on the TPU
(tiny shapes; remote-compile round trip per probe). Prints OK/FAIL per
probe -- run before trusting any kernel design to a 20-minute compile.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax

_retry = int(os.environ.get("TPU_BENCH_RETRY", "0"))
if (jax.default_backend() == "cpu" and _retry < 10
        and os.environ.get("BENCH_ALLOW_CPU") != "1"):
    print(f"# tpu init failed (attempt {_retry}); retrying", file=sys.stderr)
    os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
    time.sleep(8)
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(f"# backend={jax.default_backend()}", flush=True)


def probe(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(out if not isinstance(out, tuple) else out[0])
        print(f"OK   {name}  ({time.time()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}  ({time.time()-t0:.1f}s): {msg}", flush=True)
        return False


# ---- 1. 3D transpose (B, R, L) -> (L, R, B), majors<->minors
def t_transpose_big():
    def k(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (2, 1, 0))
    x = jnp.arange(128 * 8 * 32, dtype=jnp.uint32).reshape(128, 8, 32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 8, 128), jnp.uint32))(x)


probe("transpose (128,8,32)->(32,8,128)", t_transpose_big)


# ---- 2. the v2 failure: merge minor dims (16,16,8)->(16,128)
def t_reshape_merge():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(16, 128)
    x = jnp.arange(16 * 16 * 8, dtype=jnp.uint32).reshape(16, 16, 8)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32))(x)


probe("reshape (16,16,8)->(16,128)", t_reshape_merge)


# ---- 2b. merge where minormost is already 128: (16,2,128)->(32,128)
def t_reshape_merge_major():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(32, 128)
    x = jnp.arange(16 * 2 * 128, dtype=jnp.uint32).reshape(16, 2, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.uint32))(x)


probe("reshape (16,2,128)->(32,128)", t_reshape_merge_major)


# ---- 3. squeeze (16,1,128)->(16,128)
def t_squeeze():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(16, 128)
    x = jnp.arange(16 * 128, dtype=jnp.uint32).reshape(16, 1, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32))(x)


probe("squeeze (16,1,128)->(16,128)", t_squeeze)


# ---- 4. dynamic-shift lane roll on 2D
def t_roll_dyn_lane():
    def k(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)
    x = jnp.arange(16 * 128, dtype=jnp.uint32).reshape(16, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((16, 128), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((16, 128), lambda i, *_: (0, 0))),
    )(jnp.array([40], jnp.int32), x)


probe("roll dynamic shift axis=1 (lane)", t_roll_dyn_lane)


# ---- 5. dynamic-shift sublane roll on 3D (16,8,128) axis=1
def t_roll_dyn_sub3d():
    def k(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)
    x = jnp.arange(16 * 8 * 128, dtype=jnp.uint32).reshape(16, 8, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 8, 128), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((16, 8, 128), lambda i, *_: (0, 0, 0))],
            out_specs=pl.BlockSpec((16, 8, 128), lambda i, *_: (0, 0, 0))),
    )(jnp.array([3], jnp.int32), x)


probe("roll dynamic shift axis=1 of 3D (sublane)", t_roll_dyn_sub3d)


# ---- 6. lax.cond on a vector-reduction predicate
def t_cond():
    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jax.lax.cond(jnp.any(x > 7), lambda _: x + 1,
                                  lambda _: x, None)
    x = jnp.arange(16 * 128, dtype=jnp.uint32).reshape(16, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32))(x)


probe("lax.cond(any(vec)) in kernel", t_cond)


# ---- 7. DMA with dynamic MINOR-dim offset: (2N, total)[:, s:s+R]
def t_dma_minor():
    def k(s_ref, x_hbm, o_ref, slab, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(s_ref[0], 128)], slab, sem)
        cp.start()
        cp.wait()
        o_ref[...] = slab[...]
    x = jnp.arange(32 * 1024, dtype=jnp.uint32).reshape(32, 1024)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((32, 128), lambda i, *_: (0, 0)),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.uint32),
                            pltpu.SemaphoreType.DMA]),
    )(jnp.array([40], jnp.int32), x)


probe("DMA dynamic minor-dim slice", t_dma_minor)


# ---- 8. fori_loop with TRACED (data-dependent) bound
def t_fori_dyn():
    def k(x_ref, o_ref):
        x = x_ref[...]
        n = jnp.max(x[0, :8]).astype(jnp.int32) % 7

        def body(i, a):
            return a + x
        o_ref[...] = jax.lax.fori_loop(0, n, body, jnp.zeros_like(x))
    x = jnp.arange(16 * 128, dtype=jnp.uint32).reshape(16, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32))(x)


probe("fori_loop traced bound", t_fori_dyn)


# ---- 9. in-loop dynamic sublane slice of a VMEM ref (16,R,128)
def t_ref_dynslice():
    def k(x_ref, o_ref):
        def body(i, a):
            return a + x_ref[:, pl.ds(i * 2, 2), :][:, 0, :]
        o_ref[...] = jax.lax.fori_loop(
            0, 4, body, jnp.zeros((16, 128), jnp.uint32))
    x = jnp.arange(16 * 8 * 128, dtype=jnp.uint32).reshape(16, 8, 128)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32))(x)


probe("in-loop dyn sublane ref slice + index", t_ref_dynslice)
