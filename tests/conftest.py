"""Test configuration: force CPU backend with a virtual 8-device mesh.

Multi-chip shardings are validated on a fake CPU mesh (the reference has no
distributed runtime at all -- SURVEY.md section 2.9); real-TPU benchmarks run
through bench.py on hardware.
"""
import os

# Must run before first jax backend init.
# NB: when the axon TPU-tunnel env is present at INTERPRETER START the
# sitecustomize hook configures itself from it; stripping vars here
# (after interpreter start) half-breaks it. To run on the vanilla local
# cpu backend instead, strip the env at process LAUNCH:
#   env -u AXON_LOOPBACK_RELAY -u PALLAS_AXON_TPU_GEN \
#       -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
#       -u AXON_POOL_SVC_OVERRIDE -u PJRT_LIBRARY_PATH python -m pytest ...
# (see .claude/skills/verify/SKILL.md).

def _strip_axon(env: dict) -> dict:
    """Remove every axon-tunnel var BY PREFIX (registration exports
    extra markers like AXON_COMPAT_VERSION at runtime; a fixed name
    list leaks them into children)."""
    return {k: v for k, v in env.items()
            if not k.startswith(("AXON", "PALLAS_AXON", "_AXON"))
            and k not in ("PJRT_LIBRARY_PATH", "PYTHONPATH",
                          "JAX_PLATFORMS")}


def _axon_relay_reachable() -> bool:
    """With PALLAS_AXON_REMOTE_COMPILE=1, EVERY XLA compile (even
    JAX_PLATFORMS=cpu) goes through the terminal-side relay; if the
    relay is down, any uncached compile hangs forever. Probe before
    committing the whole test session to that fate."""
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


_HAVE_AXON = ("PALLAS_AXON_POOL_IPS" in os.environ
              or "PALLAS_AXON_REMOTE_COMPILE" in os.environ
              or os.environ.get("JAX_PLATFORMS") == "axon")

# The test suite is CPU-only by design (virtual 8-device mesh); with the
# axon env present even JAX_PLATFORMS=cpu routes every compile through
# the remote-compile relay (~3x slower end to end, and a hang lottery
# when the relay wedges -- VERDICT r3 weak #7). Default to re-exec'ing
# onto the vanilla local cpu backend; RUN_ON_AXON=1 opts back in (only
# useful to debug the axon cpu path itself).
_NEED_REEXEC = (
    _HAVE_AXON
    and os.environ.get("_LIBSNARK_TPU_NO_REEXEC") != "1"
    and not (os.environ.get("RUN_ON_AXON") == "1"
             and _axon_relay_reachable()))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# cache namespace depends on which cpu backend we actually got: the
# axon-wrapped one (.jax_cache) or the vanilla local one
# (.jax_cache_local, when launched with the axon env stripped).
# Configured via env (NOT jax.config) so no jax import happens before a
# potential re-exec below.
_cache = ("/root/repo/.jax_cache"
          if any(k.startswith("AXON") or k.startswith("PALLAS_AXON")
                 for k in os.environ)
          else "/root/repo/.jax_cache_local")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import random

import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running; set RUN_SLOW=1 to run")
    if _NEED_REEXEC:
        # tunnel down: every uncached XLA compile would hang on the
        # dead relay. Re-exec this exact invocation with the axon env
        # stripped -> vanilla local jax-cpu backend (local LLVM
        # compiles, .jax_cache_local). Done here (not at import) so the
        # capture manager can hand back the real stdout/stderr first.
        import sys
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = _strip_axon(dict(os.environ))
        env["_LIBSNARK_TPU_NO_REEXEC"] = "1"
        env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache_local"
        sys.stderr.write("[conftest] axon env detected -- re-exec on the "
                         "vanilla local cpu backend (RUN_ON_AXON=1 to "
                         "keep the relay path)\n")
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable] + sys.orig_argv[1:], env)


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow; set RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture(scope="session")
def bn254():
    from libsnark_tpu import get_curve
    return get_curve("alt_bn128")


@pytest.fixture(scope="session")
def bls377():
    from libsnark_tpu import get_curve
    return get_curve("bls12_377")
