"""Curve registry.

Runtime curve selection replaces the reference's compile-time -DCURVE_*
forks (reference CMakeLists.txt:23-29, common/default_types/*).
"""
from __future__ import annotations

import functools

_BUILDERS = {}


def _register(name, module_name):
    _BUILDERS[name] = module_name


_register("alt_bn128", "alt_bn128")
# the reference's "bn128" (ate-pairing/xbyak backend) is the SAME curve as
# alt_bn128 -- one implementation here (common/default_types parity)
_register("bn128", "alt_bn128")
_register("bls12_377", "bls12_377")
_register("bw6_761", "bw6_761")


@functools.lru_cache(maxsize=None)
def get_curve(name: str):
    """Fetch (and memoize) a fully-built Curve bundle by name."""
    if name not in _BUILDERS:
        raise KeyError(f"unknown curve {name!r}; available: {sorted(_BUILDERS)}")
    import importlib
    mod = importlib.import_module(f".{_BUILDERS[name]}", __package__)
    return mod.build()


def available_curves():
    return sorted(_BUILDERS)
