"""Per-phase Groth16 prover wall-clocks on the real chip (r5,
VERDICT item 5): witness map + each of the 5 MSMs + total, warm
(compile-amortized), with the tunnel-RTT discipline (drain a scalar
checksum per phase, fresh randomness per rep).

usage: profile_prover_phases.py [log2c ...]   (default 12 16)
Writes/updates PROVER_PHASES.json.
"""
import json
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

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache_tpu"
                               if jax.default_backend() == "tpu"
                               else ".jax_cache_local"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from libsnark_tpu import get_curve
from libsnark_tpu.relations.examples import generate_r1cs_example
from libsnark_tpu.proof_systems.groth16 import Groth16
from libsnark_tpu.ops.msm import default_window_bits
from libsnark_tpu.reductions.r1cs_to_qap import qap_domain
from libsnark_tpu.ops.fp import FpKernel


def drain(tree):
    for v in jax.tree_util.tree_leaves(tree):
        if hasattr(v, "block_until_ready"):
            v.block_until_ready()


def profile(log2c: int, reps: int = 2):
    curve = get_curve("alt_bn128")
    nc = (1 << log2c) - 2
    cs, primary, aux = generate_r1cs_example(curve.r, nc, 1)
    g16 = Groth16(curve)
    t0 = time.monotonic()
    kp = g16.generator(cs, seed=42)
    gen_s = time.monotonic() - t0
    pk = kp.pk
    dev = pk.r1cs_dev
    fr = FpKernel(curve.fr_params)
    domain = qap_domain(fr, curve.fr_params, cs, g16.force_pow_2)
    msm_c = default_window_bits(dev.num_variables + 1)
    r = curve.r
    full = [1] + [v % r for v in primary] + [v % r for v in aux]

    # warm everything once through the full prover
    t0 = time.monotonic()
    proof = g16.prover(pk, primary, aux, seed=7)
    cold_s = time.monotonic() - t0
    assert g16.verifier_strong_IC(kp.vk, primary, proof)

    phases = {}

    def timeit(name, fn, *args):
        best = 1e9
        for _ in range(reps):
            t0 = time.monotonic()
            drain(fn(*args))
            best = min(best, time.monotonic() - t0)
        phases[name] = round(best, 3)

    assignment_mont = jnp.asarray(fr.encode(full))
    wm = pk._wm_jit
    timeit("witness_map", wm[0], assignment_mont, wm[1], wm[2])
    H_plain, full_p, aux_plain = wm[0](assignment_mont, wm[1], wm[2])
    drain((H_plain, full_p, aux_plain))
    timeit("msm_A_g1", g16.msm_affine, "g1", pk.A_query, full_p, msm_c)
    timeit("msm_B_g2", g16.msm_affine, "g2", pk.B_query_g2, full_p, msm_c)
    timeit("msm_B_g1", g16.msm_affine, "g1", pk.B_query_g1, full_p, msm_c)
    timeit("msm_H_g1", g16.msm_affine, "g1", pk.H_query, H_plain, msm_c)
    timeit("msm_L_g1", g16.msm_affine, "g1", pk.L_query, aux_plain, msm_c)

    warm = []
    for i in range(reps):
        t0 = time.monotonic()
        g16.prover(pk, primary, aux, seed=100 + i)
        warm.append(time.monotonic() - t0)

    out = {
        "constraints": nc, "domain_m": domain.m, "msm_c": msm_c,
        "gen_s": round(gen_s, 2), "prove_cold_s": round(cold_s, 2),
        "prove_warm_s": round(min(warm), 3), "phases": phases,
        "device": jax.devices()[0].platform,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    path = os.path.join(_repo, "PROVER_PHASES.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[f"groth16_2e{log2c}"] = out
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"[2^{log2c}] {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    for a in ([int(v) for v in sys.argv[1:]] or [12, 16]):
        profile(a)
