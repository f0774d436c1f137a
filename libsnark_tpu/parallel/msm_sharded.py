"""Multi-device MSM: points sharded over a mesh axis (SURVEY.md section 2.9).

The reference's only parallelism is OpenMP chunking of the bucket loop
(multi_exp(..., chunks=omp_get_max_threads()), r1cs_gg_ppzksnark.tcc:
308-314). The TPU-native design: shard the point/scalar arrays over a
1-D device mesh; every device runs the full per-window sort-and-rake
bucket pipeline on its shard (ops/msm.py window_sums); the per-window
partial sums -- O(W) points, tiny -- are combined with a log-depth
point-add tree across devices, then a single Horner window combine.

Group addition is not an XLA psum-able reduction (it's ~15k uint32 ops),
so the cross-device combine uses all_gather over the mesh axis + local
tree add inside shard_map -- the collective moves only W points per device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_msm(msm_kernel, mesh: Mesh, axis: str, points_aff, scalars,
                c: int = 8, affine: bool = False,
                method: str = "pippenger"):
    """MSM with the batch (last) axis of points/scalars sharded on `axis`.

    points_aff: (x, y, inf) global arrays; scalars (NL, m). Returns a
    Jacobian point (batch (1,)), replicated -- or affine (x, y, inf)
    when ``affine=True`` (the to_affine runs inside the same program).

    method="simple" uses the scan-based double-and-add local MSM
    (ops/msm.py msm_simple) -- identical sharding/collective structure
    with a ~100x smaller XLA graph; the choice for compile-budgeted
    mesh-validation dry runs.

    The whole pipeline (shard_map window sums + cross-device tree add +
    Horner combine) is ONE jitted program, cached per
    (kernel, mesh, axis, c, shapes) -- repeated queries of the same shape
    (A/B1/H/L in a Groth16 prove) reuse one executable instead of
    re-tracing an eager shard_map per call.
    """
    key = (msm_kernel, mesh, axis, c, affine, method,
           tuple(a.shape for a in points_aff), scalars.shape)
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        import jax as _jax

        def run(pts, sc):
            out = _sharded_msm_impl(msm_kernel, mesh, axis, pts, sc, c,
                                    method)
            return msm_kernel.ck.to_affine(out) if affine else out

        fn = _SHARDED_CACHE[key] = _jax.jit(run)
    return fn(points_aff, scalars)


_SHARDED_CACHE = {}


def _gather_tree_add(msm_kernel, axis: str, S):
    """all_gather per-device partial sums (each (.., K, 1)) over `axis`
    and reduce across devices with the kernel's log-depth point tree
    (ONE add call site -- the unrolled D-1 add chain cost ~2 s of cold
    compile per extra device). Returns (.., K, 1)."""
    G = tuple(jax.lax.all_gather(a, axis) for a in S)   # (D, .., K, 1)
    lanes = tuple(jnp.moveaxis(g, 0, -1)[..., 0, :] for g in G)  # (.., K, D)
    return msm_kernel._tree_reduce_points(lanes)


def _sharded_msm_impl(msm_kernel, mesh: Mesh, axis: str, points_aff,
                      scalars, c: int, method: str = "pippenger"):
    ck = msm_kernel.ck

    ndim_x = points_aff[0].ndim

    def spec_last(nd):
        return P(*([None] * (nd - 1) + [axis]))

    in_specs = (
        (spec_last(ndim_x), spec_last(ndim_x), P(axis)),
        spec_last(2),
    )

    if method == "simple":
        # scan double-and-add local MSM; partial sums combine by a
        # plain cross-device point-add tree (one "window")
        def local_simple(pts, sc):
            S = msm_kernel.msm_simple(pts, sc)       # batch (1,)
            S = tuple(a[..., None, :] for a in S)    # (.., 1, 1)
            acc = _gather_tree_add(msm_kernel, axis, S)
            return tuple(jnp.moveaxis(a, -2, 0) for a in acc)

        try:
            f = shard_map(local_simple, mesh=mesh, in_specs=in_specs,
                          out_specs=_replicated_specs(points_aff),
                          check_vma=False)
        except TypeError:
            f = shard_map(local_simple, mesh=mesh, in_specs=in_specs,
                          out_specs=_replicated_specs(points_aff),
                          check_rep=False)
        S_total = f(points_aff, scalars)
        # single pseudo-window: combine is the identity (2^0 weight)
        return tuple(a[0] for a in S_total)

    def local(pts, sc):
        S = msm_kernel.window_sums_auto(pts, sc, c)  # (W, ..coords.., 1)
        # kernels expect limbs leading / batch trailing: move the window
        # axis into the batch position for the cross-device adds
        S = tuple(jnp.moveaxis(a, 0, -2) for a in S)   # (.., W, 1)
        acc = _gather_tree_add(msm_kernel, axis, S)
        # back to window-leading for the Horner combine
        return tuple(jnp.moveaxis(a, -2, 0) for a in acc)

    # jax renamed check_rep -> check_vma; support both (the axon-patched
    # shard_map still uses the old name)
    try:
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=_replicated_specs(points_aff),
                      check_vma=False)
    except TypeError:
        f = shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=_replicated_specs(points_aff),
                      check_rep=False)
    S_total = f(points_aff, scalars)
    return msm_kernel.combine_windows(S_total, c)


def pad_for_mesh(points_aff, scalars, mult: int):
    """Pad the batch axis to a multiple of `mult` with infinity points and
    zero scalars (shard_map needs even divisibility)."""
    m = scalars.shape[-1]
    pad = (-m) % mult
    if pad == 0:
        return points_aff, scalars
    x, y, inf = points_aff

    def padlast(a, val=0):
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, cfg, constant_values=val)

    return ((padlast(x), padlast(y), padlast(inf, True)),
            padlast(scalars))


def _replicated_specs(points_aff):
    nd = points_aff[0].ndim
    # window sums: (W,) + coord dims + (1,) -- all replicated
    return tuple(P(*([None] * (nd + 1))) for _ in range(3))
