"""Device bring-up of the fused Pallas bucket-reduce MSM path.

1. correctness: window_sums_fused vs window_sums_dense at 2^12 (both on
   device, decoded results compared exactly),
2. timing: fused vs dense at 2^16 (transfer-free: jit returns a single
   coordinate checksum so the axon tunnel never drains MB-scale data).

Usage: python scripts/bringup_fused_msm.py [log2m] [c]
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
                  os.path.join(_repo,
                               ".jax_cache_tpu"
                               if jax.default_backend() == "tpu"
                               else ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel, default_window_bits
from libsnark_tpu.ops.limbs import LIMB_BITS

print("backend:", jax.default_backend(), flush=True)

log2m = int(sys.argv[1]) if len(sys.argv) > 1 else 12
c_arg = int(sys.argv[2]) if len(sys.argv) > 2 else 0

curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
ck = CurveKernel(fq, "G1")
mk = MSMKernel(ck, curve.r.bit_length())
m = 1 << log2m
c = c_arg or default_window_bits(m)
nl = -(-curve.r.bit_length() // LIMB_BITS)
rng = np.random.default_rng(1)

# random points as k_i * G (device fixed-base), random scalars
base = ck.encode_points([curve.G1.one()], jacobian=False)
ks = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
ks[-1] &= 0x0FFF
W8 = -(-curve.r.bit_length() // 8)


@jax.jit
def gen(bx, by, sc):
    t = mk.window_table((bx, by), 8, W8)
    taff = ck.to_affine(t)
    return ck.to_affine(mk.batch_exp(taff, sc, 8))


t0 = time.monotonic()
pts = gen(base[0], base[1], jnp.asarray(ks))
pts = jax.tree_util.tree_map(lambda a: a.block_until_ready(), pts)
print(f"points built in {time.monotonic()-t0:.1f}s", flush=True)

s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
s[-1] &= 0x2FFF
s_dev = jnp.asarray(s)


def run(kind):
    def f(p, sc):
        if kind == "fused":
            S = mk.window_sums_fused(p, sc, c)
        else:
            S = mk.window_sums_dense(p, sc, c)
        out = mk.combine_windows(S, c)
        # checksum only: keeps the tunnel out of the timing
        return tuple(a[..., 0].astype(jnp.uint64).sum() for a in out), out

    jf = jax.jit(f)
    t0 = time.monotonic()
    chk, out = jf(pts, s_dev)
    jax.block_until_ready(chk)
    t_first = time.monotonic() - t0
    # steady-state: time checksum-only reruns
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        chk, out = jf(pts, s_dev)
        jax.block_until_ready(chk)
        times.append(time.monotonic() - t0)
    dt = min(times)
    print(f"[{kind}] first={t_first:.2f}s steady={dt:.4f}s "
          f"({m/dt:,.0f} pts/s)", flush=True)
    return out


dense_out = run("dense")
fused_out = run("fused")
g_dense = ck.decode_points(dense_out, curve.G1)[0]
g_fused = ck.decode_points(fused_out, curve.G1)[0]
assert g_dense == g_fused, "fused != dense result"
print("MATCH: fused == dense", flush=True)
