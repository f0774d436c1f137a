"""Multi-scalar multiplication kernels (libff multi_exp equivalent).

Variable-base MSM: signed-digit Pippenger re-designed for SIMD/TPU --
instead of the reference's branch-per-scalar bucket loop
(kc_multiexp.tcc:63-89, multi_exp BDLO12_signed), each window

  1. extracts signed c-bit digits from packed-limb scalars (vectorized),
  2. sorts point indices by |digit| (XLA sort),
  3. rakes buckets in rounds: round r gathers the r-th point of every
     bucket and performs ONE (B+1)-lane masked mixed-add -- total group
     work ~= m adds per window with B-way parallelism and a tiny graph,
  4. aggregates sum_b b*S_b with two Hillis-Steele point-scans
     (fori_loop + dynamic-slice shifts: log-depth, constant graph size),
  5. combines windows with a Horner scan (c doublings + 1 add per step).

Fixed-base batch exp (libff batch_exp / get_window_table parity, use site
r1cs_gg_ppzksnark.tcc:316-398): device-built window tables via point
prefix-scan, then gather+add per window.

All group ops are the branchless Jacobian kernels from ops/ec.py; scalars
are plain (non-Montgomery) 16-bit-limb arrays.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK


def default_window_bits(m: int) -> int:
    """Window size heuristic balancing bucket work (bits/c * m) vs
    aggregation work (bits/c * 2^c * c).

    Measured on v5e at 2^16 (scripts/sweep_msm_c.py, fused kernel):
    c=10 143.7ms / c=11 158 / c=12 196 / c=13 273 -- occupancy padding
    and the suffix-scan width grow faster than the window count
    shrinks, so c = 10 is the device optimum at the segment size.
    MSMs beyond SEGMENT are scanned in SEGMENT-point slices, so the
    heuristic keys on the slice size, not the total batch.

    (The round-2 note about c >= 11 faulting the v5e worker applied to
    the retired rake program; the fused-kernel sweep above ran c = 11
    .. 13 without incident.)"""
    m_eff = min(m, MSMKernel.SEGMENT)
    return max(4, min(10, int(math.log2(max(m_eff, 2))) - 6))


def _tree_map(f, *pts):
    return tuple(f(*xs) for xs in zip(*pts))


class MSMKernel:
    """MSM over one curve group.

    Parameters
    ----------
    ck : CurveKernel (G1 or G2)
    scalar_bits : bit length of the scalar field modulus r
    """

    def __init__(self, ck, scalar_bits: int):
        self.ck = ck
        self.fk = ck.fk
        self.scalar_bits = scalar_bits

    def __hash__(self):
        return hash((self.ck, self.scalar_bits))

    def __eq__(self, o):
        return (isinstance(o, MSMKernel) and o.ck == self.ck
                and o.scalar_bits == self.scalar_bits)

    # ------------------------------------------------------------------ digits
    def signed_digits(self, scalars, c: int):
        """(NL, m) scalar limbs -> (W, m) |digit| int32 and (W, m) sign bool.

        Signed c-bit windows: digit in [-(2^(c-1)-1), 2^(c-1)], so buckets
        1..2^(c-1). LSB window first.
        """
        nl, = scalars.shape[:1]
        m = scalars.shape[1]
        W = -(-self.scalar_bits // c) + 1
        half = 1 << (c - 1)
        full = 1 << c
        mask = full - 1
        abss, signs = [], []
        carry = jnp.zeros((m,), dtype=jnp.uint32)
        for w in range(W):
            o = c * w
            li, sh = o // LIMB_BITS, o % LIMB_BITS
            if li < nl:
                raw = scalars[li] >> sh
                if sh + c > LIMB_BITS and li + 1 < nl:
                    raw = raw | (scalars[li + 1] << (LIMB_BITS - sh))
            else:
                raw = jnp.zeros((m,), dtype=jnp.uint32)
            raw = (raw & mask) + carry
            neg = raw > half
            abss.append(jnp.where(neg, full - raw, raw).astype(jnp.int32))
            signs.append(neg)
            carry = neg.astype(jnp.uint32)
        return jnp.stack(abss), jnp.stack(signs)

    # ------------------------------------------------------- point scan helpers
    def _shifted(self, pts, width, shift):
        """Shift a width-lane point array left by `shift` (traced), filling
        with infinity, via pad + dynamic slice on the last axis."""
        ck = self.ck

        def sh(a):
            pad = jnp.zeros(a.shape[:-1] + (width,), dtype=a.dtype)
            ext = jnp.concatenate([a, pad], axis=-1)
            return jax.lax.dynamic_slice_in_dim(ext, shift, width, axis=-1)

        X, Y, Z = pts
        # after slicing, lanes pulled from the pad region have Z=0 => infinity
        return (sh(X), sh(Y), sh(Z))

    def _suffix_scan_add(self, pts, width):
        """T_j = sum_{b >= j} P_b via Hillis-Steele: log2(width) rounds of
        point add with doubling shifts. Graph: ONE point add."""
        ck = self.ck
        steps = max(1, (width - 1).bit_length())

        def body(k, T):
            return ck.add(T, self._shifted(T, width, jnp.int32(1) << k))

        return jax.lax.fori_loop(0, steps, body, pts)

    # ------------------------------------------------------------- core MSM
    def msm(self, points_aff, scalars, c: int = None):
        """sum_i scalars[i] * P_i.

        points_aff: (x, y, inf_mask) affine arrays, batch m on last axis.
        scalars: (NL, m) uint32 plain-integer limbs.
        Returns a Jacobian point with batch shape (1,).
        """
        c = c or default_window_bits(scalars.shape[-1])
        S = self.window_sums_auto(points_aff, scalars, c)
        return self.combine_windows(S, c)

    # segment size for very large MSMs: per-segment graphs stay in the
    # (well-tested, compile-service-sized) 2^16 class; window sums from
    # disjoint segments combine by plain point addition
    SEGMENT = 1 << 16

    def window_sums_auto(self, points_aff, scalars, c: int):
        """Dense bucket-matrix path for large batches; the sequential
        rake below the threshold (the rake's per-round cost only hurts
        at scale, and the dense graph compiles slower -- not worth it
        for tiny MSMs). Batches beyond SEGMENT are scanned in
        SEGMENT-point slices (one compiled body, bounded compile-time
        and HBM working set). LIBSNARK_TPU_MSM_DENSE: 1 force dense,
        0 force rake, auto = by size."""
        flag = os.environ.get("LIBSNARK_TPU_MSM_DENSE", "auto")
        m = scalars.shape[-1]
        if m > self.SEGMENT and flag != "0":
            return self._window_sums_segmented(points_aff, scalars, c)
        return self._window_sums_chunk(points_aff, scalars, c)

    def _window_sums_chunk(self, points_aff, scalars, c: int):
        """Window sums for one <= SEGMENT-sized batch: fused Pallas /
        dense XLA / rake selection."""
        flag = os.environ.get("LIBSNARK_TPU_MSM_DENSE", "auto")
        m = scalars.shape[-1]
        # fused Pallas bucket-reduce kernel: the TPU default for
        # G1/plain-Fp since r4 (353k vs 223k pts/s at 2^16 over the
        # dense XLA path). LIBSNARK_TPU_MSM_FUSED: 0 disable, 1 force
        # (interpret off-TPU), auto = TPU G1 at dense-worthy sizes.
        fused_flag = os.environ.get("LIBSNARK_TPU_MSM_FUSED", "auto")
        if fused_flag != "0":
            from .pallas_ec import ec_pallas_ok
            # mul_by_a gate: the fused kernel bodies hard-code a = 0
            # (dbl-2009-l); generic-a curves (MNT cycle) stay on the
            # dense path whose group ops route through CurveKernel
            if (ec_pallas_ok(self.fk) and self.ck.mul_by_a is None
                    and (fused_flag == "1" or m >= 2048)):
                return self.window_sums_fused(points_aff, scalars, c)
        use_dense = (flag == "1" or (flag not in ("0",) and m >= 2048))
        if use_dense:
            return self.window_sums_dense(points_aff, scalars, c)
        return self.window_sums(points_aff, scalars, c)

    def _window_sums_segmented(self, points_aff, scalars, c: int):
        ck = self.ck
        m = scalars.shape[-1]
        S = self.SEGMENT
        pad = (-m) % S
        x, y, inf = points_aff
        if pad:
            cfg = lambda a, v=0: jnp.pad(
                a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                constant_values=v)
            x, y = cfg(x), cfg(y)
            inf = cfg(inf, True)
            scalars = jnp.pad(scalars,
                              [(0, 0)] * (scalars.ndim - 1) + [(0, pad)])
        nseg = (m + pad) // S

        def to_segs(a):
            return jnp.moveaxis(
                a.reshape(a.shape[:-1] + (nseg, S)), -2, 0)

        segs = (to_segs(x), to_segs(y), to_segs(inf))
        sc_segs = to_segs(scalars)

        def body(acc, seg):
            px, py, pinf, sc = seg
            Sw = self._window_sums_chunk((px, py, pinf), sc, c)
            # window_sums returns window-leading; accumulate limbs-first
            Sw_l = _tree_map(lambda a: jnp.moveaxis(a, 0, -2), Sw)
            return ck.add(acc, Sw_l), None

        W = -(-self.scalar_bits // c) + 1
        acc0 = ck.zero((W, 1))                # limbs-first (.., W, 1)
        out, _ = jax.lax.scan(body, acc0,
                              (segs[0], segs[1], segs[2], sc_segs))
        return _tree_map(lambda a: jnp.moveaxis(a, -2, 0), out)

    def window_sums(self, points_aff, scalars, c: int):
        """Per-window bucket-aggregated sums S_w (leading axis W).

        ALL windows rake together: one while_loop over bucket rounds with
        batch shape (W, B+1) -- a single (W*(B+1))-lane masked mixed-add
        per round instead of a scan over windows (the TPU is latency-bound
        on these tiny batches, so W-fold widening is a near-free ~W-fold
        reduction in sequential steps). Points are never materialized in
        sorted order; each round gathers its (W, B+1) positions through
        the per-window argsort permutation.

        This is the shardable core: partial window sums from disjoint point
        ranges combine by plain point addition (see parallel/msm_sharded)."""
        ck, fk = self.ck, self.fk
        m = scalars.shape[-1]
        B = 1 << (c - 1)
        x, y, inf = points_aff
        digits, signs = self.signed_digits(scalars, c)   # (W, m)
        W = digits.shape[0]

        order = jnp.argsort(digits, axis=-1)             # (W, m)
        dig_s = jnp.take_along_axis(digits, order, axis=-1)
        counts = jax.vmap(lambda d: jax.ops.segment_sum(
            jnp.ones((m,), jnp.int32), d, num_segments=B + 1))(dig_s)
        starts = jnp.cumsum(counts, axis=-1) - counts    # (W, B+1)
        counts = counts.at[:, 0].set(0)                  # never rake bucket 0
        max_rounds = jnp.max(counts)
        y_neg = fk.neg(y)
        widx = jnp.arange(W)[:, None]
        acc0 = ck.zero((W, B + 1))

        def rake_cond(state):
            r, _ = state
            return r < max_rounds

        def rake_body(state):
            r, acc = state
            pos = jnp.clip(starts + r, 0, m - 1)         # (W, B+1)
            valid = r < counts
            pg = jnp.take_along_axis(order, pos, axis=-1)  # global indices
            qx = x[..., pg]                              # (.., W, B+1)
            sgn = signs[widx, pg]
            qy = fk.select(sgn, y_neg[..., pg], y[..., pg])
            qinf = inf[pg]
            acc = ck.madd(acc, (qx, qy, qinf), valid=valid)
            return (r + 1, acc)

        _, buckets = jax.lax.while_loop(
            rake_cond, rake_body, (jnp.int32(0), acc0))

        # weighted aggregation: sum_j j * S_j, via two suffix point-scans
        T = self._suffix_scan_add(buckets, B + 1)        # suffix sums
        R = self._suffix_scan_add(T, B + 1)              # sum of suffixes
        total = _tree_map(lambda a: a[..., 0:1], R)      # sum_{j>=0} T_j
        t0 = _tree_map(lambda a: a[..., 0:1], T)         # T_0 (weight fix)
        S_w = ck.add(total, ck.neg(t0))                  # batch (W, 1)
        # window-leading layout (scan-stacking parity for the combiners)
        return _tree_map(lambda a: jnp.moveaxis(a, -2, 0), S_w)

    def _sort_and_bounds(self, digits, m, B, c):
        """Per-window stable sort by digit + bucket boundary tables.

        Packed single-u32 sort (digit << idx_bits | idx) with
        searchsorted boundaries when the bits fit -- ~6x cheaper than
        argsort + take_along_axis + segment_sum on TPU; falls back to
        the general path otherwise. Returns (order, starts, counts)
        with bucket 0 zeroed in counts."""
        idx_bits = max(1, (m - 1).bit_length())
        if (c - 1) + 1 + idx_bits <= 32:
            iota = jax.lax.broadcasted_iota(jnp.uint32, digits.shape, 1)
            packed = (digits.astype(jnp.uint32) << idx_bits) | iota
            skey = jnp.sort(packed, axis=-1)
            order = (skey & ((1 << idx_bits) - 1)).astype(jnp.int32)
            dig_s = (skey >> idx_bits).astype(jnp.int32)
            targets = jnp.arange(B + 2, dtype=jnp.int32)
            bounds = jax.vmap(
                lambda d: jnp.searchsorted(d, targets))(dig_s)
            starts = bounds[:, : B + 1].astype(jnp.int32)
            counts = (bounds[:, 1: B + 2] - bounds[:, : B + 1]
                      ).astype(jnp.int32)
        else:
            order = jnp.argsort(digits, axis=-1)
            dig_s = jnp.take_along_axis(digits, order, axis=-1)
            counts = jax.vmap(lambda d: jax.ops.segment_sum(
                jnp.ones((m,), jnp.int32), d, num_segments=B + 1))(dig_s)
            starts = jnp.cumsum(counts, axis=-1) - counts
        return order, starts, counts.at[:, 0].set(0)

    def _sort_signed_bounds(self, digits, signs, m, B, c):
        """Per-window sort with the digit SIGN packed into the key:
        key = (|digit| << (idx_bits+1)) | (sign << idx_bits) | idx.

        The sorted key directly yields the signed row index
        (idx + sign*m) into a doubled [P | -P] table -- no
        take_along_axis for signs and no separate order gather (the
        r4 pipeline spent ~20 ms of the 2^16 MSM on exactly that
        lane-axis take, scripts/probe_gather4.py). Returns
        (gidx, starts, counts) with bucket 0 zeroed; falls back to the
        general argsort path when the bits don't fit."""
        idx_bits = max(1, (m - 1).bit_length())
        if (c - 1) + 1 + idx_bits + 1 <= 32:
            iota = jax.lax.broadcasted_iota(jnp.uint32, digits.shape, 1)
            packed = ((digits.astype(jnp.uint32) << (idx_bits + 1))
                      | (signs.astype(jnp.uint32) << idx_bits) | iota)
            skey = jnp.sort(packed, axis=-1)
            gidx = (skey & ((1 << (idx_bits + 1)) - 1)).astype(jnp.int32)
            if m != (1 << idx_bits):
                sgn = gidx >> idx_bits
                gidx = (gidx & ((1 << idx_bits) - 1)) + sgn * m
            dig_s = (skey >> (idx_bits + 1)).astype(jnp.int32)
            targets = jnp.arange(B + 2, dtype=jnp.int32)
            bounds = jax.vmap(
                lambda d: jnp.searchsorted(d, targets))(dig_s)
            starts = bounds[:, : B + 1].astype(jnp.int32)
            counts = (bounds[:, 1: B + 2] - bounds[:, : B + 1]
                      ).astype(jnp.int32)
            return gidx, starts, counts.at[:, 0].set(0)
        order, starts, counts = self._sort_and_bounds(digits, m, B, c)
        sgn_sorted = jnp.take_along_axis(signs, order, axis=-1)
        gidx = order + sgn_sorted.astype(jnp.int32) * m
        return gidx, starts, counts

    def _tree_reduce_points(self, P):
        """Reduce a Jacobian point array over its LAST batch axis with a
        log-depth add tree.

        Two shapes of the same log-depth reduction:
        * TPU (Pallas group ops): python halving loop -- each level is a
          half-width add, total group work ~2*width (the perf path; the
          adds are single fused kernel launches).
        * elsewhere: ONE add call site inside a fori_loop, shifting by a
          traced halving offset on a constant-width array. Same depth,
          width*log(width) lanes of (parallel) work -- but the XLA graph
          holds a single point-add instead of log2(width) differently
          shaped ones, which is the difference between a 31 s and a 3 s
          cold compile (the dominant cost of every small-MSM program on
          a 1-core host).
        """
        ck = self.ck
        width = P[0].shape[-1]
        if width == 1:
            return P
        from .pallas_ec import ec_pallas_ok
        if ec_pallas_ok(self.fk):
            while width > 1:
                if width % 2:
                    P = _tree_map(
                        lambda a: jnp.concatenate(
                            [a, jnp.zeros_like(a[..., :1])], axis=-1), P)
                    # Z pad lane is 0 -> infinity; X/Y zeros are harmless
                    width += 1
                h = width // 2
                P = ck.add(_tree_map(lambda a: a[..., :h], P),
                           _tree_map(lambda a: a[..., h:], P))
                width = h
            return P
        # lean path: pad to a power of two (pad lanes Z=0 = infinity)
        W = 1 << max(0, (width - 1).bit_length())
        if W != width:
            P = _tree_map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros_like(a[..., :1]).repeat(W - width, -1)],
                    axis=-1), P)

        def body(k, T):
            # fold the upper half onto the lower: shift = W >> (k+1)
            return ck.add(T, self._shifted(T, W, W >> (k + 1)))

        out = jax.lax.fori_loop(0, W.bit_length() - 1, body, P)
        return _tree_map(lambda a: a[..., 0:1], out)

    def window_sums_dense(self, points_aff, scalars, c: int,
                          rounds_pad: int = None):
        """Dense bucket-matrix bucket accumulation (v2).

        The rake (window_sums) runs ~m/B sequential masked-madd rounds --
        each a gather + kernel launch; at 2^16 points that is ~180
        latency-bound steps. Here the per-bucket point lists are padded
        to a fixed chunk length R and gathered in ONE shot into a dense
        (W, B+1, R) layout, then reduced over R with a log-depth masked
        point-add tree: ~log2(R) big kernel launches. Work grows by the
        bucket-occupancy padding (~1.5x at c=10) but the sequential-step
        count drops ~20x -- the TPU is latency-bound at these sizes.

        Correctness under adversarial scalar distributions (a bucket with
        count >> E[count], e.g. all-equal scalars): an outer while_loop
        processes ceil(max_count / R) chunks -- 1 chunk in the random
        case, more only when some bucket overflows R.
        """
        ck, fk = self.ck, self.fk
        m = scalars.shape[-1]
        B = 1 << (c - 1)
        x, y, inf = points_aff
        digits, signs = self.signed_digits(scalars, c)   # (W, m)
        W = digits.shape[0]

        if rounds_pad is None:
            mean = m / B
            # ~max over W*B near-binomial buckets: the extreme-value
            # bound sqrt(2 var ln n) with a 1.35 safety factor + slack.
            # (The round-2 2.5x factor over-padded ~2x; overflow beyond
            # R is handled by the chunk loop anyway, so the right trade
            # is a tight R with a rare second pass.)
            rounds_pad = int(mean + 1.35 * math.sqrt(
                2.0 * max(mean, 1.0) * math.log(max(W * B, 2))) + 8)
            rounds_pad = min(max(rounds_pad, 8), max(m, 2))
            # cap the one-shot chunk lane count (~4M lanes keeps the
            # working set under HBM: at 2^20 the uncapped chunk wants
            # ~36M lanes = 27.7GB); deeper buckets just take extra
            # chunk-loop iterations
            rounds_pad = min(rounds_pad,
                             max(16, (1 << 22) // (W * (B + 1))))
        rounds_pad += rounds_pad % 2                     # even (clean tree)

        order, starts, counts = self._sort_and_bounds(digits, m, B, c)

        # Row-major point table (r4): TPU gathers are ROW-count bound
        # (~264M rows/s measured, scripts/profile_gather2.py) -- three
        # lane-axis takes from (N, m) tables ran ~2.7x slower than ONE
        # row gather + transpose. rows = [x | y] per point, [x | -y] in
        # the second half (digit signs become +m on the row index);
        # infinity rows are all-zero (y == 0 is never a valid affine
        # point on these odd-order curves, so qy == 0 recovers inf).
        lead = x.shape[:-1]
        D = int(np.prod(lead)) if lead else 1
        live = jnp.logical_not(inf)[:, None]             # (m, 1)
        xr = jnp.where(live, x.reshape(D, m).T, 0)       # (m, D)
        yr = jnp.where(live, y.reshape(D, m).T, 0)
        ynr = jnp.where(live, fk.neg(y).reshape(D, m).T, 0)
        rows = jnp.concatenate(
            [jnp.concatenate([xr, yr], axis=1),
             jnp.concatenate([xr, ynr], axis=1)], axis=0)  # (2m, 2D)
        # final row index per (window, sorted position)
        sgn_sorted = jnp.take_along_axis(signs, order, axis=-1)
        gidx_flat = (order + sgn_sorted.astype(jnp.int32) * m).reshape(-1)

        def reduce_windows(w_lo, w_hi, nb, R):
            """Dense gather + tree reduce for windows [w_lo, w_hi) over
            buckets [0, nb), chunk length R. Returns (w_hi-w_lo, nb)
            Jacobian bucket sums (chunk while_loop guards occupancy
            beyond R). All gathers are FLAT 1D index arrays -- the
            multi-dim fancy-index forms lower ~20x slower on TPU."""
            Wn = w_hi - w_lo
            st = jax.lax.slice(starts, (w_lo, 0), (w_hi, nb))
            ct = jax.lax.slice(counts, (w_lo, 0), (w_hi, nb))
            r_idx = jnp.arange(R, dtype=jnp.int32)
            max_count = jnp.max(ct)
            woff = (jnp.arange(w_lo, w_hi, dtype=jnp.int32) * m
                    )[:, None, None]                     # (Wn, 1, 1)

            def chunk(base):
                pos = jnp.clip(st[..., None] + base + r_idx, 0, m - 1)
                valid = (base + r_idx) < ct[..., None]   # (Wn, nb, R)
                flat_sorted = (woff + pos).reshape(-1)   # into gidx_flat
                rg = jnp.take(gidx_flat, flat_sorted)    # row indices
                g = jnp.take(rows, rg, axis=0)           # (K, 2D) rows
                gt = g.T                                 # (2D, K)
                sh = lead + (Wn, nb, R)
                qx = gt[:D].reshape(sh)
                qy = gt[D:].reshape(sh)
                qinf = jnp.all(gt[D:] == 0, axis=0).reshape(Wn, nb, R)
                qinf = jnp.logical_or(qinf, jnp.logical_not(valid))
                half = R // 2
                # level 0: both operands are affine rows -> mmadd
                # (6 muls/lane vs ~11 for the Jacobian madd)
                acc = ck.aadd(
                    (qx[..., :half], qy[..., :half], qinf[..., :half]),
                    (qx[..., half:], qy[..., half:], qinf[..., half:]))
                P = self._tree_reduce_points(acc)
                return _tree_map(lambda a: a[..., 0], P)  # (Wn, nb)

            def cond(state):
                t, _ = state
                return t * R < max_count

            def body(state):
                t, accb = state
                return t + 1, ck.add(accb, chunk(t * R))

            _, out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), ck.zero((Wn, nb))))
            return out

        # ---- window split (round-2 fix): PARTIAL top windows cover
        # < c scalar bits, so their digits land in ~2^eff buckets with
        # occupancy ~m/2^eff >> m/B -- one uniform R would force the
        # chunk loop through ~B/2^eff full passes (the round-1 rake ran
        # ~8000 such rounds at 2^16). Each top window gets its own
        # (bucket-count, depth) shape instead.
        W_full = min(W, self.scalar_bits // c)
        groups = []
        if W_full > 0:
            groups.append(reduce_windows(0, W_full, B + 1, rounds_pad))
        for w in range(W_full, W):
            eff = max(0, min(c, self.scalar_bits - c * w))
            prev_eff = max(0, min(c, self.scalar_bits - c * (w - 1)))
            # signed-digit carries only escape FULL windows (a window
            # with eff < c has raw+carry <= 2^eff <= half): a zero-width
            # window behind a partial one is provably all-zero digits
            if eff == 0 and prev_eff < c:
                groups.append(ck.zero((1, B + 1)))
                continue
            # digits <= 2^eff (+1 carry); the chunk loop still guards.
            # Same extreme-value padding as the main group (the old
            # 4x-mean heuristic over-padded the top window ~4x: at
            # eff=4/m=2^16 it gathered a (18, 16384) slab where ~4400
            # rows suffice).
            nb = min(B + 1, (1 << eff) + 2)
            mean_w = m / max(1, nb - 2)
            occ = int(mean_w + 1.35 * math.sqrt(
                2.0 * max(mean_w, 1.0) * math.log(max(nb, 2))) + 8)
            Rw = min(max(8, occ + occ % 2), max(m, 2))
            row = reduce_windows(w, w + 1, nb, Rw)       # (1, nb)
            if nb < B + 1:                               # pad with inf
                zpt = ck.zero((1, B + 1 - nb))
                row = tuple(jnp.concatenate([a, z], axis=-1)
                            for a, z in zip(row, zpt))
            groups.append(row)
        buckets = _tree_map(
            lambda *gs: jnp.concatenate(gs, axis=-2), *groups)

        # weighted aggregation: sum_j j * S_j = sum_{j>=1} T_j where
        # T_j = sum_{b>=j} S_b -- ONE suffix point-scan, then a plain
        # log-depth reduction over lanes 1..B (half the lane work of the
        # round-2 double-scan form)
        T = self._suffix_scan_add(buckets, B + 1)
        S_w = self._tree_reduce_points(
            _tree_map(lambda a: a[..., 1:], T))          # batch (W, 1)
        return _tree_map(lambda a: jnp.moveaxis(a, -2, 0), S_w)

    def window_sums_fused(self, points_aff, scalars, c: int,
                          rounds_pad: int = None, interpret: bool = False):
        """Bucket accumulation via the fused Pallas bucket-reduce kernel
        (ops/pallas_bucket.py): sort -> ONE row gather straight into the
        kernel's interleaved lane layout -> one kernel sweep that madd-
        accumulates each bucket's rows in R_SUB-row sub-chunks and
        collapses the partial sums with a lane-roll tree. G1/plain-Fp
        only.

        Digit signs are baked into the gather by indexing a doubled
        [P | -P] row table; infinity rows are all-zero (y == 0 is never
        a valid affine point on these curves); positions beyond a
        bucket's count gather clipped garbage that the kernel's count
        mask kills.

        No window splitting: partial top windows concentrate digits in
        few buckets, but the kernel's per-tile trip count scales with
        the actual occupancy, so skewed buckets cost compute
        proportional to their size (extra outer chunk passes re-gather,
        but their exhausted tiles exit immediately)."""
        from .pallas_bucket import bucket_reduce, B_TILE
        from .pallas_bucket import R_SUB as _R_SUB_DEFAULT
        # phase-1 sub-chunk rows (phase-2 tree depth = log2): 8 default,
        # env-tunable for device sweeps (scripts/sweep_msm_c.py)
        R_SUB = int(os.environ.get("LIBSNARK_TPU_MSM_RSUB",
                                   str(_R_SUB_DEFAULT)))
        ck, fk = self.ck, self.fk
        N = fk.N
        # ext = 2: Fp2 coordinates (a = 0 G2 twists) -- rows are
        # [x0 x1 | y0 y1], the kernel runs the same formulas through
        # the _F2 bundle (r5; kc B-query MSM,
        # r1cs_gg_ppzksnark.tcc:544-556)
        ext = 2 if hasattr(fk, "fp") else 1
        FW = ext * N
        m = scalars.shape[-1]
        B = 1 << (c - 1)
        x, y, inf = points_aff
        digits, signs = self.signed_digits(scalars, c)   # (W, m)
        W = digits.shape[0]

        if rounds_pad is None:
            mean = m / B
            rounds_pad = int(mean + 1.35 * math.sqrt(
                2.0 * max(mean, 1.0) * math.log(max(W * B, 2))) + 8)
        # multiple of R_SUB, capped so the kernel's (2*FW, R*128) block
        # stays within a VMEM budget (double-buffered by the pipeline);
        # deeper buckets take extra outer chunk passes. Wide fields
        # (FW >= 48: BLS12-377 Fp2) also halve the phase-1 compute
        # width -- the v5e scoped-vmem limit is 16 MB and the N=24 Fp2
        # body at CW=512 with a 4 MB block measured 16.86 MB (r5).
        if FW >= 48:
            R_SUB = min(R_SUB, 2)
            budget = 2 << 20
        else:
            budget = 4 << 20
        R_CAP = max(R_SUB, budget // (2 * FW * B_TILE * 4))
        R = -(-max(min(rounds_pad, R_CAP), R_SUB) // R_SUB) * R_SUB

        gidx, starts, counts = self._sort_signed_bounds(
            digits, signs, m, B, c)

        # doubled row table [P | -P]; infinity -> all-zero rows
        live = jnp.logical_not(inf)[:, None]             # (m, 1)
        x2 = x.reshape(FW, m)
        y2 = y.reshape(FW, m)
        yn2 = fk.neg(y).reshape(FW, m)
        xr = jnp.where(live, x2.T, 0)
        rows_pos = jnp.concatenate([xr, jnp.where(live, y2.T, 0)], axis=1)
        rows_neg = jnp.concatenate(
            [xr, jnp.where(live, yn2.T, 0)], axis=1)
        rows_all = jnp.concatenate([rows_pos, rows_neg], axis=0)  # (2m,2FW)

        # per-sorted-position signed row index (from the packed sort)
        gidx_flat = gidx.reshape(-1)
        woff = (jnp.arange(W, dtype=jnp.int32) * m)[:, None]
        starts_g = starts + woff                         # global offsets

        def reduce_group(w_lo, w_hi, nb_g, R_g, V=1, R_lo=None):
            """Fused bucket reduction for windows [w_lo, w_hi) over
            buckets [0, nb_g), chunk depth R_g; an outer while_loop
            re-gathers for buckets deeper than V*R_g (extra passes cost
            only this GROUP's gather, and exhausted tiles exit in the
            kernel). Returns (w_hi-w_lo, nb_g) Jacobian bucket sums.

            V > 1 splits every bucket's run into V VIRTUAL sub-buckets
            of stride ceil(count/V), reduced in parallel lanes and
            recombined with a log-depth point tree -- the skewed-bucket
            fix (a partial top window has ~m/2^eff points per bucket;
            one lane per bucket would grind ~occ/R_g re-gather passes:
            measured 40 ms of the 184 ms 2^16 MSM before this).

            R_lo < R_g enables TWO-CLASS gather depth (r5): count-sorted
            packing puts the deepest buckets in the first tiles, so only
            a ~3% head of tiles is gathered at full depth R_g; the tail
            gathers at R_lo ~ mean + 2.2 sigma. The gather is the cost
            being cut (rows gathered ~ T*R*128 regardless of occupancy);
            the kernel already charges per-tile actual trip counts.
            Overflow beyond either depth is caught by the same chunk
            while_loop (extreme-value tails, adversarial inputs)."""
            Wn = w_hi - w_lo
            st = jax.lax.slice(starts_g, (w_lo, 0), (w_hi, nb_g))
            ct = jax.lax.slice(counts, (w_lo, 0), (w_hi, nb_g))
            if V > 1:
                stride = -(-ct // V)                     # (Wn, nb_g)
                v_idx = jnp.arange(V, dtype=jnp.int32)
                st = st[..., None] + stride[..., None] * v_idx
                ct = jnp.clip(ct[..., None] - stride[..., None] * v_idx,
                              0, stride[..., None])
            sfl, cfl = st.reshape(-1), ct.reshape(-1)
            nbf = Wn * nb_g * V
            nb_pad = -(-nbf // B_TILE) * B_TILE
            if nb_pad != nbf:
                sfl = jnp.pad(sfl, (0, nb_pad - nbf))
                cfl = jnp.pad(cfl, (0, nb_pad - nbf))
            # count-sorted tile packing: each tile's trip count is its
            # MAX bucket count; sorting buckets by count makes tiles
            # homogeneous, so total trips track the MEAN (~1.25x ->
            # ~1.05x of sum(count)/R_SUB at c=10)
            perm = jnp.argsort(-cfl)
            inv_perm = jnp.argsort(perm)
            sfl = jnp.take(sfl, perm)
            cfl = jnp.take(cfl, perm)
            T = nb_pad // B_TILE
            # two-class split: head tiles at depth R_g, tail at R_lo
            if R_lo is not None and R_lo < R_g and T >= 8:
                T_hi = max(1, -(-T // 32))
            else:
                T_hi, R_lo = T, R_g
            classes = [(0, T_hi, R_g)]
            if T_hi < T:
                classes.append((T_hi, T, R_lo))
            # sub-split classes so each kernel call's OUT coordinate
            # arrays (3 x FW x tiles*B_TILE u32, which XLA keeps in
            # VMEM next to the gathered block) stay inside the 16 MB
            # scoped-vmem limit -- the BLS12-377 (N=24) Fp2 kernel at
            # 185 tiles hit "scoped allocation 16.86M > 16.00M" (r5)
            t_max = max(1, (6 << 20) // (12 * FW * B_TILE))
            classes = [(ts, min(ts + t_max, t1), R_c)
                       for (t0, t1, R_c) in classes
                       for ts in range(t0, t1, t_max)]
            max_count = jnp.max(cfl)
            cls_data = []
            for (t0, t1, R_c) in classes:
                lo, hi = t0 * B_TILE, t1 * B_TILE
                sf_c = sfl[lo:hi].reshape(t1 - t0, B_TILE)
                cf_c = cfl[lo:hi]
                R2 = R_c // R_SUB
                i_idx = jnp.arange(R2, dtype=jnp.int32)
                r_idx = jnp.arange(R_SUB, dtype=jnp.int32)
                # static per-chunk offset skeleton, lane layout (i,r,j)
                off = (i_idx[:, None, None] * R_SUB
                       + r_idx[None, :, None])           # (R2, R_SUB, 1)
                cls_data.append((sf_c, cf_c, off, R_c, t1 - t0))

            def chunk(t, accb):
                outs = []
                for sf_c, cf_c, off, R_c, T_c in cls_data:
                    pos = sf_c[:, None, None, :] + t * R_c + off
                    rg = jnp.take(
                        gidx_flat,
                        jnp.clip(pos, 0, W * m - 1).reshape(-1))
                    g = jnp.take(rows_all, rg, axis=0)   # (K, 2FW)
                    G = jnp.transpose(
                        g.reshape(T_c, R_c * B_TILE, 2 * FW), (0, 2, 1))
                    cta = jnp.clip(cf_c - t * R_c, 0, R_c)
                    outs.append(bucket_reduce(fk, G, cta, R_c,
                                              interpret=interpret,
                                              r_sub=R_SUB))
                XYZ = _tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=-1), *outs)
                if ext == 2:
                    # (2N, nb) kernel rows -> (2, N, nb) Fp2 coords
                    XYZ = _tree_map(
                        lambda a: a.reshape(2, N, a.shape[-1]), XYZ)
                return ck.add(accb, XYZ)

            def cond(state):
                t, _ = state
                # every class exhausts its own depth schedule; the
                # slowest class keeps the loop alive
                alive = [t * R_c < jnp.max(cf_c)
                         for _, cf_c, _, R_c, _ in cls_data]
                return functools.reduce(jnp.logical_or, alive)

            def body(state):
                t, accb = state
                return t + 1, chunk(t, accb)

            _, bs = jax.lax.while_loop(
                cond, body, (jnp.int32(0), ck.zero((nb_pad,))))
            bs = _tree_map(lambda a: jnp.take(a, inv_perm, axis=-1), bs)
            out = _tree_map(
                lambda a: a[..., :nbf].reshape(
                    a.shape[:-1] + (Wn, nb_g * V)), bs)
            if V > 1:
                # recombine virtual sub-buckets: log-depth point tree
                out = _tree_map(
                    lambda a: a.reshape(a.shape[:-1] + (nb_g, V)), out)
                out = self._tree_reduce_points(out)
                out = _tree_map(lambda a: a[..., 0], out)
            return out

        # ---- window split (as in the dense path): partial top windows
        # cover < c scalar bits, so their digits land in ~2^eff buckets
        # with occupancy >> m/B -- folding them into the full-window
        # group would drag EVERY window through ~occ/R re-gather passes
        # (measured 21 passes = 5x the dense path before this split).
        W_full = min(W, self.scalar_bits // c)
        groups = []
        if W_full > 0:
            # tail-class depth: mean + 2.2 sigma (binomial occupancy);
            # the ~3% head of count-sorted tiles keeps the full R
            mean = m / B
            R_tail = int(mean + 2.2 * math.sqrt(max(mean, 1.0)) + 4)
            R_tail = -(-max(min(R_tail, R), R_SUB) // R_SUB) * R_SUB
            groups.append(reduce_group(0, W_full, B + 1, R,
                                       R_lo=R_tail))
        for w in range(W_full, W):
            eff = max(0, min(c, self.scalar_bits - c * w))
            prev_eff = max(0, min(c, self.scalar_bits - c * (w - 1)))
            if eff == 0 and prev_eff < c:
                groups.append(ck.zero((1, B + 1)))       # provably zero
                continue
            nb_g = min(B + 1, (1 << eff) + 2)
            mean_w = m / max(1, nb_g - 2)
            occ = int(mean_w + 1.35 * math.sqrt(
                2.0 * max(mean_w, 1.0) * math.log(max(nb_g, 2))) + 8)
            # virtual splits keep the chunk depth near the full-group R
            V = 1
            while -(-occ // V) > max(R, 64):
                V *= 2
            Rw = -(-max(min(-(-occ // V) + 8, 256), R_SUB)
                   // R_SUB) * R_SUB
            row = reduce_group(w, w + 1, nb_g, Rw, V)    # (1, nb_g)
            if nb_g < B + 1:                             # pad with inf
                zpt = ck.zero((1, B + 1 - nb_g))
                row = tuple(jnp.concatenate([a, z], axis=-1)
                            for a, z in zip(row, zpt))
            groups.append(row)
        buckets = _tree_map(
            lambda *gs: jnp.concatenate(gs, axis=-2), *groups)

        # weighted aggregation: sum_j j * S_j = sum_{j>=1} T_j, one
        # suffix point-scan + a log-depth lane reduction (same agg as
        # the dense path)
        T = self._suffix_scan_add(buckets, B + 1)
        S_w = self._tree_reduce_points(
            _tree_map(lambda a: a[..., 1:], T))          # batch (W, 1)
        return _tree_map(lambda a: jnp.moveaxis(a, -2, 0), S_w)

    def combine_windows(self, S, c: int):
        """Horner combine of per-window sums: sum_w 2^(cw) S_w.

        On TPU/G1 this is ONE fused Pallas kernel (c doublings + 1 add
        per window, single-lane); the XLA scan fallback costs ~W*(c+1)
        kernel launches."""
        ck = self.ck
        from .pallas_ec import ec_pallas_ok
        if ec_pallas_ok(self.fk) and self.ck.mul_by_a is None:
            from .pallas_bucket import horner_combine
            W = S[0].shape[0]
            ext = 2 if hasattr(self.fk, "fp") else 1
            FW = ext * self.fk.N
            flat = tuple(
                jnp.moveaxis(a, 0, -2)[..., 0].reshape(FW, W) for a in S)
            out = horner_combine(self.fk, flat, c)
            if ext == 2:
                out = tuple(a.reshape(2, self.fk.N, 1) for a in out)
            return out
        # MSB window first
        S_rev = _tree_map(lambda a: jnp.flip(a, axis=0), S)

        def comb(acc, s_w):
            acc = ck.dbl_n(acc, c)
            return ck.add(acc, s_w), None

        out, _ = jax.lax.scan(comb, ck.zero((1,)), S_rev)
        return out

    # ------------------------------------------- host-driven segmentation
    def msm_eager_segmented(self, points_aff, scalars, c: int = None):
        """Host-loop segmentation for VERY large MSMs: one jitted
        window-sums chunk executable reused across SEGMENT-point
        slices + a jitted point-add combine, instead of one giant
        `lax.scan` program.

        Exists because huge scan-segmented MSM programs are a v5e
        worker-crash risk class: r4 bisected the Fp2 dense body
        (scripts/repro_v5e_fp2_scan_fault.py); r5 found the KZG 2^22
        commit (64 fused G1 segments over the device-built SRS) also
        kills the worker while the same-shape MSM over freshly-built
        inputs passes — the trigger is not fully root-caused, so the
        2^22-class entry points route here (~segments x RTT extra
        dispatch cost, noise at this scale). Groth16-scale (<= 2^21)
        scans have been solid and keep the in-graph path."""
        c = c or default_window_bits(scalars.shape[-1])
        ck = self.ck
        S = self.SEGMENT
        m = scalars.shape[-1]
        x, y, inf = points_aff
        pad = (-m) % S
        if pad:
            cfg = lambda a, v=0: jnp.pad(
                a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                constant_values=v)
            x, y = cfg(x), cfg(y)
            inf = cfg(inf, True)
            scalars = jnp.pad(
                scalars, [(0, 0)] * (scalars.ndim - 1) + [(0, pad)])
        nseg = (m + pad) // S
        chunk = jax.jit(lambda p, s: tuple(
            jnp.moveaxis(a, 0, -2)
            for a in self._window_sums_chunk(p, s, c)))
        comb = jax.jit(lambda A, B: ck.add(A, B))
        W = -(-self.scalar_bits // c) + 1
        acc = ck.zero((W, 1))
        for k in range(nseg):
            sl = slice(k * S, (k + 1) * S)
            Sw = chunk((x[..., sl], y[..., sl], inf[..., sl]),
                       scalars[..., sl])
            acc = comb(acc, Sw)
        return self.combine_windows(
            _tree_map(lambda a: jnp.moveaxis(a, -2, 0), acc), c)

    # ---------------------------------------------------- compile-lean MSM
    def msm_simple(self, points_aff, scalars):
        """Scan-based double-and-add MSM: per-lane scalar multiply (one
        lax.scan over scalar bits, 2 group ops per step) + log-depth
        lane reduction. O(bits * m) group work -- far more FLOPs than
        Pippenger, but the graph is ~100x smaller, which makes it the
        right kernel for mesh-validation dry runs and tiny MSMs where
        XLA compile time dominates wall clock."""
        ck = self.ck
        m = scalars.shape[-1]
        x, y, inf = points_aff
        nl = scalars.shape[0]
        # bits MSB-first as a (bits, m) bool array
        bit_idx = np.arange(self.scalar_bits)[::-1]
        li = jnp.asarray(bit_idx // LIMB_BITS, dtype=jnp.int32)
        sh = jnp.asarray(bit_idx % LIMB_BITS, dtype=jnp.uint32)
        bits = ((scalars[li] >> sh[:, None]) & 1).astype(bool)

        def step(acc, b):
            acc = ck.dbl(acc)
            added = ck.madd(acc, (x, y, inf))
            return ck.select(b, added, acc), None

        acc, _ = jax.lax.scan(step, ck.zero((m,)), bits)
        return self._tree_reduce_points(acc)

    # ------------------------------------------------------------ fixed base
    def window_table(self, base_aff, c: int, num_windows: int):
        """Device-built fixed-base table: T[w, j] = j * 2^(c w) * base.

        base_aff: (x, y) single affine point with batch shape (1,).
        Returns Jacobian table with batch shape (num_windows, 2^c).
        """
        ck = self.ck
        # G_w = 2^(c w) * base: sequential c*num_windows doublings via scan
        base_j = (base_aff[0], base_aff[1], ck.fk.one((1,)))

        def dbl_win(g, _):
            return ck.dbl_n(g, c), g

        _, gs = jax.lax.scan(dbl_win, base_j, None, length=num_windows)
        # scan stacks windows on axis 0; move behind the field lead axes so
        # kernels still see limbs first: (.., N, num_windows, 1)
        gs = _tree_map(lambda a: jnp.moveaxis(a, 0, -2), gs)
        L = 1 << c
        rep = _tree_map(
            lambda a: jnp.repeat(a, L, axis=-1), gs)  # (.., N, W, L)
        # lane j should hold j * G_w: prefix-sum scan of [inf, G, G, ...]
        lane = jnp.arange(L)
        X, Y, Z = rep
        Z = jnp.where((lane == 0), jnp.zeros_like(Z), Z)  # lane 0 = infinity

        def body(k, T):
            # T_j += T_{j - 2^k} (prefix): shift RIGHT by 2^k with inf fill
            def sh(a):
                pad = jnp.zeros(a.shape[:-1] + (L,), dtype=a.dtype)
                ext = jnp.concatenate([pad, a], axis=-1)
                return jax.lax.dynamic_slice_in_dim(
                    ext, L - (jnp.int32(1) << k), L, axis=-1)
            shifted = (sh(T[0]), sh(T[1]), sh(T[2]))
            return ck.add(T, shifted)

        table = jax.lax.fori_loop(0, max(1, (L - 1).bit_length()), body,
                                  (X, Y, Z))
        return table

    def batch_exp(self, table_aff, scalars, c: int):
        """Fixed-base exponentiation: out[i] = scalars[i] * base.

        table_aff: affine table (x, y, inf) with batch (num_windows, 2^c)
        from ``window_table`` + ``to_affine``.
        scalars: (NL, m) plain limbs. Returns Jacobian batch (m,).
        """
        ck = self.ck
        m = scalars.shape[-1]
        tx, ty, tinf = table_aff
        W = tx.shape[-2]
        # unsigned digit extraction
        digs = []
        for w in range(W):
            o = c * w
            li, sh = o // LIMB_BITS, o % LIMB_BITS
            if li < scalars.shape[0]:
                raw = scalars[li] >> sh
                if sh + c > LIMB_BITS and li + 1 < scalars.shape[0]:
                    raw = raw | (scalars[li + 1] << (LIMB_BITS - sh))
                raw = raw & ((1 << c) - 1)
            else:
                raw = jnp.zeros((m,), jnp.uint32)
            digs.append(raw.astype(jnp.int32))
        digits = jnp.stack(digs)  # (W, m)

        def body(acc, wd):
            w, dig = wd
            qx = jnp.take(tx[..., w, :], dig, axis=-1)
            qy = jnp.take(ty[..., w, :], dig, axis=-1)
            qi = jnp.take(tinf[w], dig, axis=-1)
            return ck.madd(acc, (qx, qy, qi)), None

        acc0 = ck.zero((m,))
        out, _ = jax.lax.scan(body, acc0, (jnp.arange(W), digits))
        return out


def msm_host_scalars(msm_kernel, points_aff, scalar_ints, r, c=None):
    """Convenience: python-int scalars -> device MSM."""
    from .limbs import ints_to_limbs
    nl = -(-r.bit_length() // LIMB_BITS)
    sc = jnp.asarray(ints_to_limbs([s % r for s in scalar_ints], nl))
    return msm_kernel.msm(points_aff, sc, c)
