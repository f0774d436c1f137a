"""Shared kernel bundle for pairing-based proof systems.

Every ppzkSNARK in the reference repeats the same machinery: fixed-base
window-table exponentiation at setup (libff get_window_table/batch_exp,
e.g. r1cs_gg_ppzksnark.tcc:316-398) and variable-base multi_exp at prove
time. Here that machinery is one device bundle per curve: packed-limb
field kernels, Jacobian curve kernels, Pippenger MSM, and fixed-base
batch-exp -- shared by Groth16 / GM17 / BCTV14 / DFGK14 / KZG.
"""
from __future__ import annotations

import secrets
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fp import FpKernel
from ..ops.fp2 import Fp2Kernel
from ..ops.ec import CurveKernel
from ..ops.msm import MSMKernel, default_window_bits
from ..ops.limbs import ints_to_limbs


class PairingSystem:
    """Device kernel bundle over a named curve (G2 over Fq2 towers)."""

    def __init__(self, curve):
        self.curve = curve
        self.fr = FpKernel(curve.fr_params)
        self.fq = FpKernel(curve.fq_params)
        # curve a-coefficients (0 for the pairing-friendly a=0 families;
        # the MNT cycle curves have generic j-invariant)
        a_int = int(getattr(curve, "a", 0))
        g1_mul_a = ((lambda x, fk=self.fq, k=a_int: fk.mul_small(x, k))
                    if a_int else None)
        self.g1 = CurveKernel(self.fq, f"{curve.name}.G1",
                              mul_by_a=g1_mul_a, a_tag=str(a_int))
        deg = getattr(curve, "g2_field_degree", 2)
        if deg == 1:
            # k=6 outer curves (BW6-761): G2 lives over Fq itself
            self.fq2 = None
            a2 = int(getattr(curve, "a2", 0))
            mul_a2 = ((lambda x, fk=self.fq, k=a2: fk.mul_small(x, k))
                      if a2 else None)
            self.g2 = CurveKernel(self.fq, f"{curve.name}.G2",
                                  mul_by_a=mul_a2, a_tag=str(a2))
        elif deg == 3:
            # MNT6: G2 on the quadratic twist over Fq3
            from ..ops.fp3 import Fp3Kernel
            self.fq2 = Fp3Kernel(self.fq, int(curve.Fq3.NON_RESIDUE))
            ks = tuple(int(c) for c in (curve.a2.c0, curve.a2.c1,
                                        curve.a2.c2))
            mul_a2 = ((lambda x, fk=self.fq2, k=ks: fk.mul_by_const(x, *k))
                      if any(ks) else None)
            self.g2 = CurveKernel(self.fq2, f"{curve.name}.G2",
                                  mul_by_a=mul_a2, a_tag=str(ks))
        else:
            self.fq2 = Fp2Kernel(self.fq, int(curve.Fq2.NON_RESIDUE))
            a2t = getattr(curve, "a2", None)
            ks = ((int(a2t.c0), int(a2t.c1)) if a2t is not None
                  else (0, 0))
            mul_a2 = ((lambda x, fk=self.fq2, k=ks: fk.mul_by_const(x, *k))
                      if any(ks) else None)
            self.g2 = CurveKernel(self.fq2, f"{curve.name}.G2",
                                  mul_by_a=mul_a2, a_tag=str(ks))
        sbits = curve.r.bit_length()
        self.msm_g1 = MSMKernel(self.g1, sbits)
        self.msm_g2 = MSMKernel(self.g2, sbits)
        self.scalar_limbs = -(-sbits // 16)

    # -- randomness -------------------------------------------------------
    def _rng(self, seed: Optional[int]):
        r = self.curve.r
        if seed is None:
            return lambda: secrets.randbelow(r - 1) + 1
        import random as _random
        rng = _random.Random(seed)
        return lambda: rng.randrange(1, r)

    # -- host <-> device conversions ---------------------------------------
    def scalars_to_dev(self, xs):
        return jnp.asarray(ints_to_limbs([x % self.curve.r for x in xs],
                                         self.scalar_limbs))

    # Shape bucketing: every device program is compiled for power-of-two
    # lengths only, so circuits of different sizes share XLA executables
    # (one compile per bucket, not per circuit). Pad slots hold scalar 0 /
    # the point at infinity -- both are exact no-ops for batch-exp and for
    # Pippenger (zero digits land in the never-raked bucket 0).
    @staticmethod
    def bucket(n: int) -> int:
        return max(16, 1 << max(0, n - 1).bit_length())

    @staticmethod
    def pad_to(arr, target: int):
        """Pad the last axis with zeros up to `target` lanes."""
        pad = target - arr.shape[-1]
        if pad <= 0:
            return arr
        return jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, pad)])

    def fixed_base_g1(self, base_host, scalars, c=8):
        """[s * base for s in scalars] as device affine G1 (x, y, inf),
        PADDED to the enclosing power-of-two bucket (pad = infinity)."""
        if self.host_keygen:
            return self._fixed_base_host(self.g1, base_host, scalars)
        return self._fixed_base(self.g1, self.msm_g1, base_host, scalars, c)

    def fixed_base_g2(self, base_host, scalars, c=8):
        if self.host_keygen:
            return self._fixed_base_host(self.g2, base_host, scalars)
        return self._fixed_base(self.g2, self.msm_g2, base_host, scalars, c)

    # Pure-Python fixed-base path: no XLA programs at all. Used by tiny
    # circuits (driver dryrun, unit tests) where the device table-build
    # compile would dwarf the work; enable via `system.host_keygen = True`.
    host_keygen = False

    def _fixed_base_host(self, ck, base_host, scalars, c=8):
        """Windowed fixed-base: ONE shared table (all exps share the
        base), then ~ceil(bits/c) table-adds per scalar — ~12x fewer
        host EC ops than per-scalar double-and-add, which matters once
        host_keygen meets 10^5-variable circuits (cycle PCD keygen)."""
        r = self.curve.r
        nbits = r.bit_length()
        W = -(-nbits // c)
        zero = base_host.group.zero()
        # table[w][d] = (d << (c*w)) * base
        table = []
        B = base_host
        for w in range(W):
            row = [zero]
            acc = zero
            for _ in range((1 << c) - 1):
                acc = acc + B
                row.append(acc)
            table.append(row)
            B = acc + B          # (2^c - 1)*B_w + B_w = B_{w+1}
        mask = (1 << c) - 1
        pts = []
        for s in scalars:
            s = int(s) % r
            acc = zero
            w = 0
            while s:
                d = s & mask
                if d:
                    acc = acc + table[w][d]
                s >>= c
                w += 1
            pts.append(acc)
        pts += [zero] * (self.bucket(len(pts)) - len(pts))
        return ck.encode_points(pts, jacobian=False)

    def _fixed_base(self, ck, mk, base_host, scalars, c):
        W = -(-self.curve.r.bit_length() // c)
        baff = ck.encode_points([base_host], jacobian=False)

        @jax.jit
        def build(bx, by, sc):
            table = mk.window_table((bx, by), c, W)
            taff = ck.to_affine(table)
            return ck.to_affine(mk.batch_exp(taff, sc, c))

        scalars = list(scalars)
        scalars += [0] * (self.bucket(len(scalars)) - len(scalars))
        sc = self.scalars_to_dev(scalars)
        return build(baff[0], baff[1], sc)

    # -- cached jitted MSM dispatch ------------------------------------------
    # One jitted wrapper per (group, window); XLA then caches one
    # executable per operand SHAPE, so every same-bucket query across all
    # proof systems reuses the same compiled MSM. Keeping each MSM its
    # own program (instead of fusing all queries into one giant jit) also
    # keeps every compile in the size class the compile service handles.
    def msm_affine(self, which: str, q, scalars, c: int):
        cache = getattr(self, "_msm_jits", None)
        if cache is None:
            cache = self._msm_jits = {}
        mk = self.msm_g1 if which == "g1" else self.msm_g2
        fused_ext = False
        if which != "g1":
            from ..ops.pallas_ec import ec_pallas_ok
            import os as _os
            fused_ext = (_os.environ.get("LIBSNARK_TPU_MSM_FUSED",
                                         "auto") != "0"
                         and ec_pallas_ok(mk.fk)
                         and mk.ck.mul_by_a is None)
            if fused_ext and c >= 10:
                # Fp2 rows are 2x wide, so the VMEM R-cap binds at
                # c = 10 (two gather passes); c = 11 measured 280 vs
                # 308 ms at 2^16 (r5 sweep_msm_c.py, SWEEP_GROUP=g2).
                # Wide base fields (N = 24, BLS12-377) halve the cap
                # again -- bump one more window bit.
                c = min(c + (2 if mk.fk.N >= 24 else 1), 14)
        if which != "g1" and scalars.shape[-1] > mk.SEGMENT:
            if not fused_ext:
                # dense Fp2 body under lax.scan faults the v5e worker
                # (scripts/repro_v5e_fp2_scan_fault.py) -- host loop
                return self._msm_affine_seg_eager(mk, q, scalars, c)
            # fused Fp2 segments are a different program: the scan-
            # segmented path (one compiled body) has not shown the
            # fault and is the default since r5
        key = (which, c)
        if key not in cache:
            ck = mk.ck
            import jax as _jax
            cache[key] = _jax.jit(
                lambda q, s, mk=mk, ck=ck: ck.to_affine(mk.msm(q, s, c)))
        return cache[key](q, scalars)

    def _msm_affine_seg_eager(self, mk, q, scalars, c: int):
        """Host-driven segmentation for LARGE extension-field (G2)
        MSMs: the lax.scan segmented wrapper with the Fp2 dense body
        crashes the v5e TPU worker (r4 bisection: a single 2^16 G2
        segment passes, the G1 2^20 scan passes, the 16-segment G2 scan
        faults -- scripts/probe_g2msm20.py). One chunk executable is
        reused across segments with a jitted point-add combine; the ~16
        extra dispatches are noise at this scale."""
        import jax as _jax
        import jax.numpy as jnp
        ck = mk.ck
        S = mk.SEGMENT
        m = scalars.shape[-1]
        pad = (-m) % S
        x, y, inf = q
        if pad:
            cfg = lambda a, v=0: jnp.pad(
                a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                constant_values=v)
            x, y, inf = cfg(x), cfg(y), cfg(inf, True)
            scalars = jnp.pad(
                scalars, [(0, 0)] * (scalars.ndim - 1) + [(0, pad)])
        nseg = (m + pad) // S
        cache = self._msm_jits
        kc = ("seg_chunk", mk, c)
        if kc not in cache:
            cache[kc] = _jax.jit(
                lambda pts, sc, mk=mk: tuple(
                    jnp.moveaxis(a, 0, -2)
                    for a in mk._window_sums_chunk(pts, sc, c)))
            cache[("seg_comb", mk)] = _jax.jit(
                lambda A, B, ck=ck: ck.add(A, B))
            cache[("seg_fin", mk, c)] = _jax.jit(
                lambda A, mk=mk, ck=ck: ck.to_affine(
                    mk.combine_windows(
                        tuple(jnp.moveaxis(a, -2, 0) for a in A), c)))
        W = -(-mk.scalar_bits // c) + 1
        acc = ck.zero((W, 1))
        for i in range(nseg):
            sl = (Ellipsis, slice(i * S, (i + 1) * S))
            Sw = cache[kc]((x[sl], y[sl], inf[sl]), scalars[sl])
            acc = cache[("seg_comb", mk)](acc, Sw)
        return cache[("seg_fin", mk, c)](acc)

    def decode_g1(self, aff, lane=0):
        return self._decode_affine(self.g1, aff, self.curve.G1, lane)

    def decode_g2(self, aff, lane=0):
        return self._decode_affine(self.g2, aff, self.curve.G2, lane)

    @staticmethod
    def _decode_affine(ck, aff, group, lane=0):
        x, y, inf = aff
        if np.asarray(inf).reshape(-1)[lane]:
            return group.zero()
        if hasattr(ck.fk, "fp"):   # extension coords (Fp2 / Fp3)
            xs = [int(np.ravel(c)[lane]) for c in ck.fk.decode(x)]
            ys = [int(np.ravel(c)[lane]) for c in ck.fk.decode(y)]
            F = group.F
            return group.point(F(*xs), F(*ys))
        return group.point(int(np.ravel(ck.fk.decode(x))[lane]),
                           int(np.ravel(ck.fk.decode(y))[lane]))

    def encode_host_points_g1(self, pts):
        return self.g1.encode_points(pts, jacobian=False)

    def encode_host_points_g2(self, pts):
        return self.g2.encode_points(pts, jacobian=False)
