"""Host <-> device packed-limb conversions.

Device representation of field elements: ``LIMB_BITS``-bit (16) limbs held
in uint32 lanes, **limb axis leading, batch axes trailing** so that the
batch dimension maps onto TPU vector lanes: an Fp array has shape
``(num_limbs, *batch)``. Extension fields stack coefficients in front
(``(2, num_limbs, *batch)``); Jacobian points are (X, Y, Z) tuples of such
arrays.

This replaces libff's GMP ``bigint<n>`` host representation (SURVEY.md
section 2.8) with an XLA-native one.
"""
from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, n: int) -> np.ndarray:
    """Single int -> (n,) uint32 limb vector (little-endian limbs)."""
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.uint32)


def ints_to_limbs(xs, n: int) -> np.ndarray:
    """Iterable of ints -> (n, len(xs)) uint32 array.

    Uses the native C++ codec when available (libsnark_tpu.native);
    falls back to the Python loop."""
    xs = list(xs)
    codec = _native_codec()
    if codec is not None:
        buf = codec.encode([int(x) for x in xs], n)
        return np.frombuffer(buf, dtype=np.uint32).reshape(n, len(xs)).copy()
    out = np.empty((n, len(xs)), dtype=np.uint32)
    for j, x in enumerate(xs):
        x = int(x)
        for i in range(n):
            out[i, j] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def _native_codec():
    global _codec, _codec_tried
    if not _codec_tried:
        try:
            from ..native import limbcodec
            _codec = limbcodec()
        except Exception:
            _codec = None
        globals()["_codec_tried"] = True
    return _codec


_codec = None
_codec_tried = False


def limbs_to_int(a) -> int:
    """(n,) limb vector -> int."""
    a = np.asarray(a)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


def limbs_to_ints(a) -> list:
    """(n, B) limb array -> list of B ints (native codec when available)."""
    a = np.ascontiguousarray(np.asarray(a), dtype=np.uint32)
    n, b = a.shape
    codec = _native_codec()
    if codec is not None:
        return codec.decode(a.tobytes(), n, b)
    return [sum(int(a[i, j]) << (LIMB_BITS * i) for i in range(n))
            for j in range(b)]
