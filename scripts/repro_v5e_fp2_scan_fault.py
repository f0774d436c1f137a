"""MINIMAL REPRO — v5e worker crash: lax.scan over a dense Fp2 MSM body.

Distilled from the round-4 bisection (probe_wm20.py, probe_g2msm20.py)
of the 2^20-constraint Groth16 prover crash. Findings, in one
paragraph: on a v5e-1 (axon tunnel, jax 0.9.x-era + libtpu of this
image), a `lax.scan` whose body is the DENSE XLA formulation of the
Fp2 (G2) Pippenger bucket accumulation — per-segment: one ~2.7M-row
gather from a (2m, 4N)-u32 table, a (W, B+1, R)-lane masked Jacobian
madd tree over Fp2 coordinates, and a log-depth point reduction —
reproducibly KILLS THE TPU WORKER (tunnel drops, process sees a dead
backend; no Python exception) at 16 scan segments (m = 2^20, segment
2^16), while (a) ONE segment of the same body at 2^16 passes, (b) the
same 16-segment scan over the *G1* (plain-Fp) dense body passes, (c)
every NTT component and the witness map pass standalone at 2^20. The
failure is therefore specific to {scan} x {Fp2 dense body} x {segment
count > 1}; suspects are the scan-carried (2, N, W, 1) Jacobian
accumulator layout or compiler memory accounting for the doubled
coefficient axis under the scan loop. Workarounds shipped in-tree:
(1) a host-driven segment loop reusing one chunk executable
(proof_systems/base.py _msm_affine_seg_eager), and (2) since round 5
the default G2 path is the FUSED Pallas bucket kernel (ops/
pallas_bucket.py ext=2), whose scan-segmented form is a different
program that has not shown the fault.

Run:   python scripts/repro_v5e_fp2_scan_fault.py [logm]
       (default 2^20; expect the worker to die after several minutes
       -- run it LAST in a chip session)
Guard: LIBSNARK_TPU_MSM_FUSED=0 forces the faulting dense body; the
       fused default no longer reaches it.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)
os.environ["LIBSNARK_TPU_MSM_FUSED"] = "0"     # force the dense body

import jax

_retry = int(os.environ.get("TPU_BENCH_RETRY", "0"))
if (jax.default_backend() == "cpu" and _retry < 10
        and os.environ.get("BENCH_ALLOW_CPU") != "1"):
    print(f"# tpu init failed (attempt {_retry}); retrying",
          file=sys.stderr)
    os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
    time.sleep(8)
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax.numpy as jnp
import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_tpu"
                               if jax.default_backend() == "tpu"
                               else ".jax_cache_local"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu import get_curve
from libsnark_tpu.ops.fp import FpKernel
from libsnark_tpu.ops.fp2 import Fp2Kernel
from libsnark_tpu.ops.ec import CurveKernel
from libsnark_tpu.ops.msm import MSMKernel
from libsnark_tpu.ops.limbs import LIMB_BITS

logm = int(sys.argv[1]) if len(sys.argv) > 1 else 20
m = 1 << logm
curve = get_curve("alt_bn128")
fq = FpKernel(curve.fq_params)
fk2 = Fp2Kernel(fq, int(curve.Fq2.NON_RESIDUE))
ck = CurveKernel(fk2, "repro.G2")
mk = MSMKernel(ck, curve.r.bit_length())
nseg = m // mk.SEGMENT
print(f"# backend={jax.default_backend()} m=2^{logm} "
      f"segments={nseg} body=dense-Fp2 (fused disabled)", flush=True)

rng = np.random.default_rng(0)
nl = -(-curve.r.bit_length() // LIMB_BITS)
# exactness is irrelevant to the fault: any limb data reproduces it
x = jnp.asarray(rng.integers(0, 1 << 16, size=(2, fq.N, m),
                             dtype=np.uint32))
y = jnp.asarray(rng.integers(0, 1 << 16, size=(2, fq.N, m),
                             dtype=np.uint32))
inf = jnp.zeros((m,), dtype=bool)
s = rng.integers(0, 1 << 16, size=(nl, m), dtype=np.uint32)
s[-1] &= 0x2FFF


def cksum(tree):
    return sum(jnp.sum(v.astype(jnp.uint32), dtype=jnp.uint32)
               for v in jax.tree_util.tree_leaves(tree))


t0 = time.time()
out = np.asarray(jax.jit(
    lambda px, py, pinf, sc: cksum(mk.msm((px, py, pinf), sc, 10)))(
        x, y, inf, jnp.asarray(s)))
print(f"survived: cksum={out} ({time.time()-t0:.0f}s incl compile) -- "
      f"fault NOT reproduced on this toolchain", flush=True)
