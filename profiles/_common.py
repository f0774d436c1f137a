"""Shared plumbing for the profile_* executables (the reference's
libsnark/*/profiling/profile_*.cpp harness layer, CMakeLists.txt:128-141).

Each profile script mirrors its reference executable's argv contract:
  profile_<system>.py <num_constraints> <input_size> [Fr|bytes]
runs generator -> prover -> verifier with hierarchical timers and a
serialization round trip (run_*.tcc test_serialization=true parity).

TPU-aware: pops the tunnel-breaking env vars and retries flaky chip
init (see bench.py header notes); BENCH_ALLOW_CPU=1 permits CPU runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.pop("PYTHONPATH", None)
os.environ.pop("JAX_PLATFORMS", None)


def _axon_relay_up() -> bool:
    import socket
    for port in (8082, 8083):
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.settimeout(1.5)
        try:
            s.connect(("127.0.0.1", port))
            return True
        except OSError:
            continue
        finally:
            s.close()
    return False


def init_backend():
    # With the axon env present, jax backend init blocks forever when
    # the terminal-side relay is down -- re-exec onto the vanilla local
    # cpu backend instead of hanging (same pattern as tests/conftest.py).
    if (("PALLAS_AXON_POOL_IPS" in os.environ
         or "PALLAS_AXON_REMOTE_COMPILE" in os.environ)
            and os.environ.get("_LIBSNARK_TPU_NO_REEXEC") != "1"
            and not _axon_relay_up()):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("AXON", "PALLAS_AXON", "_AXON"))
               and k not in ("PJRT_LIBRARY_PATH", "PYTHONPATH",
                             "JAX_PLATFORMS")}
        env["_LIBSNARK_TPU_NO_REEXEC"] = "1"
        env["BENCH_ALLOW_CPU"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))),
                           ".jax_cache_local"))
        print("# axon relay unreachable -- re-exec on the local cpu "
              "backend", file=sys.stderr, flush=True)
        os.execve(sys.executable, [sys.executable] + sys.orig_argv[1:],
                  env)
    import jax
    _retry = int(os.environ.get("TPU_BENCH_RETRY", "0"))
    if (jax.default_backend() == "cpu" and _retry < 10
            and os.environ.get("BENCH_ALLOW_CPU") != "1"):
        print(f"# tpu init failed (attempt {_retry}); retrying",
              file=sys.stderr)
        os.environ["TPU_BENCH_RETRY"] = str(_retry + 1)
        time.sleep(8)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR") or
        os.path.join(repo, ".jax_cache_tpu"
                     if jax.default_backend() == "tpu" else ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def parse_std_args(default_constraints=1000, default_inputs=10):
    """num_constraints input_size [Fr|bytes] (profile_r1cs_gg_
    ppzksnark.cpp:52-64)."""
    args = sys.argv[1:]
    if len(args) not in (0, 2, 3):
        print(f"usage: {sys.argv[0]} num_constraints input_size [Fr|bytes]")
        sys.exit(1)
    nc = int(args[0]) if args else default_constraints
    ninp = int(args[1]) if args else default_inputs
    if len(args) == 3:
        assert args[2] in ("Fr", "bytes")
        if args[2] == "bytes":
            # bytes -> field elements by capacity (one bit spare)
            from libsnark_tpu import get_curve
            cap = get_curve("alt_bn128").r.bit_length() - 1
            ninp = -(-8 * ninp // cap)
    return nc, ninp


class Timed:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.monotonic()
        print(f"(enter) {self.name}", flush=True)
        return self

    def __exit__(self, *a):
        dt = time.monotonic() - self.t0
        print(f"(leave) {self.name}  [{dt:.3f}s]", flush=True)


def profile_r1cs_system(system_factory, curve_name, nc, ninp,
                        serialize_fns=None):
    """generator -> prover -> (reserialize) -> verifier, timed
    (run_r1cs_gg_ppzksnark.tcc:67-127 shape)."""
    init_backend()
    from libsnark_tpu import get_curve
    from libsnark_tpu.relations.examples import generate_r1cs_example

    curve = get_curve(curve_name)
    with Timed("Generate R1CS example"):
        cs, primary, aux = generate_r1cs_example(curve.r, nc, ninp)
    system = system_factory(curve)
    with Timed("Generator"):
        kp = system.generator(cs, seed=1)
    with Timed("Prover"):
        proof = system.prover(kp.pk, primary, aux, seed=2)
    if serialize_fns:
        with Timed("Serialization round trip"):
            proof = serialize_fns(curve, kp, proof)
    with Timed("Verifier"):
        ok = system.verifier_strong_IC(kp.vk, primary, proof)
    print(f"verification result: {'PASS' if ok else 'FAIL'}")
    assert ok
    bad = system.verifier_strong_IC(kp.vk, [(primary[0] + 1) % curve.r],
                                    proof)
    print(f"tampered-input result: {'FAIL (expected)' if not bad else 'BUG'}")
    assert not bad
    return kp, proof
