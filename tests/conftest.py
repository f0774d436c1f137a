"""Test configuration: force CPU backend with a virtual 8-device mesh.

Multi-chip shardings are validated on a fake CPU mesh (the reference has no
distributed runtime at all -- SURVEY.md section 2.9); real-TPU benchmarks run
through bench.py on hardware.
"""
import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


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
