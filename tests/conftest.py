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
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

import sys as _sys

# cache namespace depends on which cpu backend we actually got: the
# axon-wrapped one (.jax_cache) or the vanilla local one
# (.jax_cache_local, when launched with the axon env stripped)
_cache = ("/root/repo/.jax_cache"
          if any(k.startswith("AXON") or k.startswith("PALLAS_AXON")
                 for k in os.environ)
          else "/root/repo/.jax_cache_local")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import random

import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running; set RUN_SLOW=1 to run")


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
