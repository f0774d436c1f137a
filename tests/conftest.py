"""Test configuration: force CPU backend with a virtual 8-device mesh.

Multi-chip shardings are validated on a fake CPU mesh (the reference has no
distributed runtime at all -- SURVEY.md section 2.9); real-TPU benchmarks run
through bench.py on hardware.
"""
import os

# Must run before jax is imported anywhere.
# Strip the axon TPU-tunnel environment entirely: with it present, even
# JAX_PLATFORMS=cpu routes compiles through a remote compile service
# whose connections can hang indefinitely (see
# .claude/skills/verify/SKILL.md). Vanilla local jax-cpu is slower to
# compile but reliable, and honors the virtual-device flag.
for _v in ("AXON_LOOPBACK_RELAY", "PALLAS_AXON_TPU_GEN",
           "PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
           "AXON_POOL_SVC_OVERRIDE", "PJRT_LIBRARY_PATH",
           "_AXON_REGISTERED"):
    os.environ.pop(_v, None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# cache namespace for the VANILLA local cpu backend (axon-env runs used
# .jax_cache; keep them separate)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_local")
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
