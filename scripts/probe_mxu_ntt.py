"""TPU probe: int8 MXU dot support + MxDft device parity + timing.

Run FIRST when the tunnel returns (one TPU process at a time):
  python scripts/probe_mxu_ntt.py            # logn=10 parity + 2^16 timing
Env: PROBE_LOGN (default 10), PROBE_TIME_LOGN (default 16), PROBE_DTYPE.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

_retry = int(os.environ.get("TPU_BENCH_RETRY", "0"))
if jax.default_backend() == "cpu" and _retry < 10:
    print(f"# tpu init failed (attempt {_retry}); retrying", file=sys.stderr)
    os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
    time.sleep(8)
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

print("backend:", jax.default_backend(), jax.devices()[0])

# ---- 1. raw int8 dot sanity (does the toolchain lower it to MXU?) ----
A = np.random.default_rng(0).integers(0, 16, (256, 256)).astype(np.int8)
B = np.random.default_rng(1).integers(0, 16, (256, 512)).astype(np.int8)
f = jax.jit(lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
got = np.asarray(f(jnp.asarray(A), jnp.asarray(B)))
want = A.astype(np.int32) @ B.astype(np.int32)
print("int8 dot exact:", bool((got == want).all()))

# ---- 2. MxDft parity vs host oracle at PROBE_LOGN ----
import random  # noqa: E402
from libsnark_tpu import get_curve  # noqa: E402
from libsnark_tpu.ops.fp import FpKernel  # noqa: E402
from libsnark_tpu.ops.ntt import Radix2Domain  # noqa: E402

cv = get_curve("alt_bn128")
fk = FpKernel(cv.fr_params)
p = cv.fr_params.p
logn = int(os.environ.get("PROBE_LOGN", "10"))
dtype = os.environ.get("PROBE_DTYPE", "int8")
dom = Radix2Domain(fk, cv.fr_params, logn)
random.seed(3)
xs = [random.randrange(p) for _ in range(1 << logn)]
a = jnp.asarray(fk.encode(xs))
os.environ["LIBSNARK_TPU_NTT_MXU_DTYPE"] = dtype
mxt = dom._mxdft("fwd").device_tables()
out = fk.decode(jax.jit(lambda v, t: dom.fft_mxu(v, t))(a, mxt))
ref = fk.decode(dom.fft(a))
ok = all(int(x) == int(y) for x, y in zip(out, ref))
print(f"MxDft logn={logn} dtype={dtype} parity vs radix-2:", ok)
if not ok:
    sys.exit(1)

# ---- 3. transfer-free timing at PROBE_TIME_LOGN (both paths) ----
tlogn = int(os.environ.get("PROBE_TIME_LOGN", "16"))
domt = Radix2Domain(fk, cv.fr_params, tlogn)
dt = domt.device_tables()
mxt = domt._mxdft("inv").device_tables()
rng = np.random.default_rng(7)
CH = 4


def fresh():
    v = rng.integers(0, 1 << 16, size=(fk.N, 1 << tlogn), dtype=np.uint32)
    v[-1] &= 0x2FFF
    return jax.device_put(jnp.asarray(v))


def time_fn(fn, *args):
    np.asarray(fn(*args))  # compile+warm
    best = 1e9
    for _ in range(3):
        x = fresh()
        np.asarray(x[0, 0])
        t0 = time.monotonic()
        np.asarray(fn(x, *args[1:]))
        best = min(best, (time.monotonic() - t0) / CH)
    return best


def chain(step):
    def run(v, *tb):
        out = jax.lax.fori_loop(0, CH, lambda i, u: step(u, *tb), v)
        return jnp.sum(out, dtype=jnp.uint32)
    return jax.jit(run)


t_r2 = time_fn(chain(lambda v, t: domt.ifft(v, t)), fresh(), dt)
print(f"radix2 ifft 2^{tlogn}: {t_r2:.4f}s "
      f"({(1 << tlogn) / t_r2 / 1e3:.0f}k elem/s)")
t_mx = time_fn(chain(lambda v, t: domt.ifft_mxu(v, t)), fresh(), mxt)
print(f"mxu    ifft 2^{tlogn}: {t_mx:.4f}s "
      f"({(1 << tlogn) / t_mx / 1e3:.0f}k elem/s)  speedup {t_r2 / t_mx:.1f}x")
