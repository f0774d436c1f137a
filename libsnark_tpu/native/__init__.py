"""Native (C++) host-side components with on-demand compilation.

The reference delegates its host math to native code (GMP bigints, x86
asm, OpenMP, see SURVEY.md section 2.8); here the framework's host-side
hot paths get C++ equivalents compiled on first use with the system
toolchain, with pure-Python fallbacks when no compiler is available.

Currently provided: the bigint <-> packed-limb codec (_limbcodec),
accelerating every host<->device field-element transfer.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_HERE, "build")
_mod = None
_tried = False


def _build_and_load():
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    try:
        os.makedirs(_BUILD, exist_ok=True)
        ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
        so = os.path.join(_BUILD, "_limbcodec" + ext)
        src = os.path.join(_HERE, "limbcodec.cpp")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            include = sysconfig.get_paths()["include"]
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   f"-I{include}", src, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True)
        spec = importlib.util.spec_from_file_location("_limbcodec", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:
        _mod = None
    return _mod


def limbcodec():
    """The native codec module, or None if unavailable."""
    return _build_and_load()
