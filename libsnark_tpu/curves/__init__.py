"""Curve registry.

Runtime curve selection replaces the reference's compile-time -DCURVE_*
forks (reference CMakeLists.txt:23-29, common/default_types/*).
"""
from __future__ import annotations

import functools

_BUILDERS = {}


def _register(name, module_name, builder="build"):
    _BUILDERS[name] = (module_name, builder)


_register("alt_bn128", "alt_bn128")
# the reference's "bn128" (ate-pairing/xbyak backend) is the SAME curve as
# alt_bn128 -- one implementation here (common/default_types parity)
_register("bn128", "alt_bn128")
_register("bls12_377", "bls12_377")
_register("bw6_761", "bw6_761")
# the PCD cycle (reference default_types/r1cs_ppzkpcd_pp.hpp:27-38)
_register("mnt4", "mnt", "build_mnt4")
_register("mnt6", "mnt", "build_mnt6")
# the reference's 80-bit Edwards curve (k=6, cofactor 4); Edwards-form
# complete addition exposed via .edwards
_register("edwards", "edwards")


@functools.lru_cache(maxsize=None)
def get_curve(name: str):
    """Fetch (and memoize) a fully-built Curve bundle by name."""
    if name not in _BUILDERS:
        raise KeyError(f"unknown curve {name!r}; available: {sorted(_BUILDERS)}")
    import importlib
    module_name, builder = _BUILDERS[name]
    mod = importlib.import_module(f".{module_name}", __package__)
    return getattr(mod, builder)()


def available_curves():
    return sorted(_BUILDERS)
