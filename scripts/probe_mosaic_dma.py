"""Probe DMA slicing rules for the fused-MSM row slabs (r4).

The v3 kernel failed with 'Slice shape along dimension 1 must be
aligned to tiling (128), but is 32' -- find which (row-width, slice)
combinations this toolchain's Mosaic accepts for HBM->VMEM copies with
dynamic sublane offsets.
"""
import os
import sys
import time

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
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name}  ({time.time()-t0:.1f}s): {msg}", flush=True)
        return False


def dma_probe(width, R, nseg=1, into3d=False):
    """Copy (R, width) from a (1024, width) HBM array at a dynamic
    sublane offset into VMEM scratch."""
    def fn():
        def k(s_ref, x_hbm, o_ref, slab, sem):
            if into3d:
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(s_ref[0], R), :], slab.at[0], sem)
                cp.start()
                cp.wait()
                o_ref[...] = slab[0]
            else:
                cp = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(s_ref[0], R), :], slab, sem)
                cp.start()
                cp.wait()
                o_ref[...] = slab[...]
        x = jnp.arange(1024 * width, dtype=jnp.uint32).reshape(1024, width)
        scratch = (pltpu.VMEM((2, R, width), jnp.uint32) if into3d
                   else pltpu.VMEM((R, width), jnp.uint32))
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((R, width), jnp.uint32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((R, width), lambda i, *_: (0, 0)),
                scratch_shapes=[scratch, pltpu.SemaphoreType.DMA]),
        )(jnp.array([40], jnp.int32), x)
    return fn


probe("DMA (1024,32)[ds,:] -> (16,32) 2D", dma_probe(32, 16))
probe("DMA (1024,128)[ds,:] -> (16,128) 2D", dma_probe(128, 16))
probe("DMA (1024,32)[ds,:] -> slab[0] 3D", dma_probe(32, 16, into3d=True))
probe("DMA (1024,128)[ds,:] -> slab[0] 3D",
      dma_probe(128, 16, into3d=True))
probe("DMA (1024,64)[ds,:] -> (16,64) 2D", dma_probe(64, 16))
