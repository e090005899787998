"""Batched peak calling (device kernel + tiny host-side final selection).

scipy.signal.find_peaks(distance=, height=) with the reference's noise gates
(bin/call_peaks.py:13-15), vectorised over a (B, L) block of smoothed
profiles.  Semantics match ``ref/peaks.py`` (which is tested against scipy).

TPU constraints shape the design: sort/top_k/gather/scatter on (B, L)
blocks are extremely slow on this hardware, so
- the median is computed by a 32-step bitwise order-statistic search
  (count-reductions only),
- local maxima (plateau-aware) are found with static-shift forward fills,
- candidates are compacted by a per-tile (height, rightmost-position) max
  reduction with tile size <= distance: two same-tile candidates are within
  ``distance`` of each other, so scipy's selection would keep exactly the
  higher (rightmost on ties) one anyway,
- the O(#candidates) greedy distance selection runs on the host
  (ref.peaks.select_by_distance — the exact scipy port), on a few hundred
  bytes per read.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_F = jnp.float32(-3.0e38)

# Margins for the f32-vs-f64 guard: the device smooths in float32 while
# the exact spec (ref/sg.py + ref/peaks.py) runs float64.  Measured on
# bench-shaped profiles (12 reads, 7-17 kb): the f32 smoothed values
# differ from f64 by at most 7.8e-5 ABSOLUTE (~5 ulps at peak heights
# ~170), the median by 2.9e-7 relative.
# - MARGIN_REL guards comparisons against the 3x/6x-median thresholds
#   (both sides carry the error): 1e-4 relative ~ 200x the measured
#   flip zone at typical heights — conservative, and cheap because the
#   rerun no longer recomputes the DP (see exact_peaks_from_profile).
# - ORDER_REL guards the BY-HEIGHT selection priority between two
#   peaks: an order flip needs |h1-h2| within ~2x the absolute f32
#   error (1.6e-4 abs, ~1e-6 relative at height 170).  4e-6 relative
#   is ~8x that zone.  Real tandem-repeat peaks routinely sit 1e-5-1e-4
#   relative apart, so a wider margin over-fires on healthy reads (the
#   round-5 locate-thread collapse; see ROUND5.md).
MARGIN_REL = 1e-4
ORDER_REL = 4e-6
# absolute flip zone for adjacent-value structure comparisons (plateau
# merge/split, rise/drop inversion).  Measured worst f32-vs-f64 error
# of an ADJACENT DIFFERENCE of the smoothed profile: 8.4e-5 (bench-
# shaped reads; the two windows share most of their support but the
# three f32 smoothing iterations decorrelate the rounding).  A
# comparison can only flip when the true difference is inside ~2x that;
# 2e-4 gives 2.4x safety.  Only pairs at/above the 3x-median height
# can change the output, which keeps the fire rate low.
STRUCT_ATOL = 2e-4


def _pow2_at_most(n: int, lo: int = 1) -> int:
    b = lo
    while b * 2 <= n:
        b *= 2
    return b


def tile_for_distance(min_dist: int, cap: int = 64) -> int:
    return max(1, min(cap, _pow2_at_most(max(int(min_dist), 1))))


def _sortable(x: jax.Array) -> jax.Array:
    """Map float32 -> uint32 preserving order."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(b >> 31 != 0, ~b, b | jnp.uint32(0x80000000))


def _unsortable(k: jax.Array) -> jax.Array:
    b = jnp.where(k >> 31 != 0, k & jnp.uint32(0x7FFFFFFF), ~k)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _kth_smallest(keys: jax.Array, valid: jax.Array, k: jax.Array) -> jax.Array:
    """Per-row k-th smallest (0-based) of uint32 keys via 32 bit steps.

    fori_loop keeps the compiled program small (an unrolled version of the
    32 (B, L) count-reductions compiles very slowly on this toolchain)."""
    B, L = keys.shape

    def body(t, v):
        bit = jnp.uint32(31) - t.astype(jnp.uint32)
        bound = v | (jnp.uint32(1) << bit)
        below = (keys < bound[:, None]) & valid
        cnt = jnp.sum(below, axis=1)
        return jnp.where(cnt <= k, bound, v)

    return jax.lax.fori_loop(0, 32, body, jnp.zeros((B,), dtype=jnp.uint32))


def masked_median(x: jax.Array, lens: jax.Array) -> jax.Array:
    """numpy-median over the first lens[b] entries of each row (no sort)."""
    B, L = x.shape
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < lens[:, None]
    keys = jnp.where(valid, _sortable(x.astype(jnp.float32)),
                     jnp.uint32(0xFFFFFFFF))
    k1 = ((lens - 1) // 2).astype(jnp.uint32)
    k2 = (lens // 2).astype(jnp.uint32)
    lo = _unsortable(_kth_smallest(keys, valid, k1))
    hi = _unsortable(_kth_smallest(keys, valid, k2))
    return (lo + hi) * 0.5


@partial(jax.jit, static_argnames=("tile",))
def peak_candidates_batch(smoothed: jax.Array, lens: jax.Array,
                          tile: int = 64):
    """Device stage: plateau-aware local maxima -> per-tile compaction.

    smoothed: (B, L) f32 (zero beyond lens); lens: (B,) int32.
    Returns (cand_pos (B, L/tile) int32 plateau midpoints (-1 where none),
             cand_h (B, L/tile) f32, med (B,) f32, height (B,) f32,
             gated (B,) bool, deep (B,) bool).

    ``deep`` flags reads where some tile held a THIRD surviving local
    maximum beyond the top-2 the compaction keeps: only there can the
    host's greedy distance selection diverge from scipy's (a 3-deep
    elimination chain inside one tile).  Flagged reads must be re-run
    through the exact host path (ref/peaks.py) — see
    TpuBackend.locate_many / call_peaks_batch; this removes the former
    silent residual at ANY chain depth (PARITY.md §9).

    ``deep`` ALSO flags reads whose f32 threshold comparisons land within
    MARGIN_REL (relative) of the 3x-median height or 6x-median noise gate
    (bin/call_peaks.py:13-15): those decisions could differ from the f64
    spec path, so they too take the exact host rerun.  Separately counted
    (peaks_margin_host_rerun) via the ``margin`` output.
    """
    B, L = smoothed.shape
    assert L % tile == 0
    lens = lens.astype(jnp.int32)
    x = smoothed.astype(jnp.float32)
    jidx = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = jidx < lens[:, None]
    xm = jnp.where(valid, x, NEG_F)

    med = masked_median(x, lens)
    xmax = jnp.max(xm, axis=1)
    gated = xmax < 6.0 * med
    height = 3.0 * med
    # f32 margin guard, gate half: the 6x-median noise-gate comparison
    # sits within MARGIN_REL of flipping (xmax > 0 excludes all-zero
    # profiles, where both backends are exactly 0.0)
    near_gate = (xmax > 0) & (
        jnp.abs(xmax - 6.0 * med)
        <= MARGIN_REL * jnp.maximum(jnp.abs(xmax), jnp.abs(6.0 * med)))

    # local maxima: equal-value run [l, r] with strict rise into l and
    # strict drop after r (scipy plateau semantics)
    x_prev = jnp.concatenate([jnp.full((B, 1), NEG_F), xm[:, :-1]], axis=1)
    x_next = jnp.concatenate([xm[:, 1:], jnp.full((B, 1), NEG_F)], axis=1)
    is_start = xm != x_prev
    rise_prev = xm > x_prev
    drop_next = x_next < xm
    packed = jnp.where(is_start, (jidx << 1) | rise_prev.astype(jnp.int32),
                       -1)
    d = 1
    while d < L:
        packed = jnp.maximum(
            packed,
            jnp.concatenate([jnp.full((B, d), -1, dtype=jnp.int32),
                             packed[:, :-d]], axis=1))
        d *= 2
    l_run = packed >> 1
    rise_at_l = (packed & 1) == 1

    is_peak = rise_at_l & (l_run >= 1) & drop_next & \
        (jidx <= lens[:, None] - 2)
    ok = is_peak & (xm >= height[:, None]) & ~gated[:, None]
    # f32 margin guard, height half: some local maximum's 3x-median
    # height acceptance sits within MARGIN_REL of flipping
    near_h = is_peak & (xm > 0) & (
        jnp.abs(xm - height[:, None])
        <= MARGIN_REL * jnp.maximum(jnp.abs(xm), jnp.abs(height)[:, None]))
    # f32 margin guard, STRUCTURE half: an adjacent pair of smoothed
    # values at/above the acceptance threshold whose difference sits
    # inside the f32 flip zone (measured error <= 7.8e-5 absolute; 4e-4
    # = 5x).  A flipped adjacent comparison there can merge/split a
    # plateau or invert a rise/drop, moving a reported peak by a base
    # or adding/removing one — invisible to the threshold guards.
    # Restricting to above-threshold pairs keeps the rate tiny (noise
    # maxima below 3x-median can flip freely without entering the
    # output).
    near_struct = (valid & (x_next > NEG_F / 2)
                   & (xm >= height[:, None]) & (x_next >= height[:, None])
                   & (jnp.abs(x_next - xm) <= STRUCT_ATOL))
    margin = near_gate | jnp.any(near_h | near_struct, axis=1)
    h = jnp.where(ok, xm, NEG_F)
    midpoint = (l_run + jidx) // 2

    # per-tile top-2 (height, rightmost position among equal max) reduction.
    # Keeping two candidates per tile covers the chain case where the tile
    # winner is eliminated by a stronger peak < distance away while the
    # runner-up survives scipy's selection (see PARITY.md for the residual
    # 3-deep edge case).
    M = L // tile
    h_t = h.reshape(B, M, tile)
    mid_t = jnp.where(ok, midpoint, -1).reshape(B, M, tile)

    def tile_best(h_t):
        hmax = jnp.max(h_t, axis=2)
        pos_sel = jnp.max(
            jnp.where(h_t == hmax[:, :, None], mid_t, -1), axis=2)
        return hmax, jnp.where(hmax > NEG_F / 2, pos_sel, -1)

    h1, p1 = tile_best(h_t)
    # runner-up: drop only the winner's position, re-reduce
    h_t2 = jnp.where(mid_t == p1[:, :, None], NEG_F, h_t)
    h2, p2 = tile_best(h_t2)
    # third-candidate detector: any tile with a surviving candidate
    # beyond the top-2 -> exact host rerun for that read
    h_t3 = jnp.where(mid_t == p2[:, :, None], NEG_F, h_t2)
    deep = jnp.any(jnp.max(h_t3, axis=2) > NEG_F / 2, axis=1)

    cand_pos = jnp.concatenate([p1, p2], axis=1)
    cand_h = jnp.concatenate([h1, h2], axis=1)
    return cand_pos, cand_h, med, height, gated, deep, margin


def margin_competitors_host(cand_pos: np.ndarray, cand_h: np.ndarray,
                            min_dist: int = 0) -> np.ndarray:
    """Reads where two surviving candidates' by-height selection order
    could flip between f32 and f64 (within ORDER_REL) AND the flip can
    affect the output: such reads join the exact host rerun (same
    peaks_margin_host_rerun counter).  Tiny host work on the compacted
    (B, 2M) candidate block.

    Soundness of the interaction filter (min_dist > 0): swapping the
    processing order of a near-equal pair (A, B) can only change
    select_by_distance's result through peaks within ceil(distance) of
    A or B.  If |A - B| >= ceil(distance) and NO other candidate lies
    within ceil(distance) of either, both survive under either order
    and nothing else is affected — skip the flag."""
    # f32 screen (the guard has >= 2x safety margin over the measured
    # flip zone, and the candidates are f32 natively; f64 would double
    # the per-launch sort cost for identical flag decisions)
    h = np.where(cand_pos >= 0, cand_h.astype(np.float32), np.nan)
    hs = np.sort(h, axis=1)               # NaNs (empty slots) sort last
    d = np.diff(hs, axis=1)
    scale = np.maximum(np.abs(hs[:, :-1]), np.abs(hs[:, 1:]))
    with np.errstate(invalid="ignore"):
        near = d <= np.float32(ORDER_REL) * scale  # NaN cmp -> False
    out = np.any(near, axis=1)
    if min_dist <= 0 or not out.any():
        return out
    dist = int(np.ceil(min_dist))
    for b in np.flatnonzero(out):
        sel = cand_pos[b] >= 0
        pos = np.sort(cand_pos[b][sel].astype(np.int64))
        hb = np.sort(h[b][sel])
        gaps = np.diff(hb)
        sc = np.maximum(np.abs(hb[:-1]), np.abs(hb[1:]))
        pairs = np.flatnonzero(gaps <= ORDER_REL * sc)
        # candidate spacing: any neighbour within dist of anything?
        spaced = np.diff(pos)
        if len(pos) >= 2 and spaced.min() >= dist:
            # every candidate is >= dist from every other: no pair can
            # interact with anything — all near-pairs are harmless
            out[b] = False
            continue
        # otherwise keep the flag unless every near pair is isolated
        safe = True
        for pi_ in pairs:
            v1, v2 = hb[pi_], hb[pi_ + 1]
            members = np.flatnonzero((h[b][sel] == v1) | (h[b][sel] == v2))
            mpos = cand_pos[b][sel][members].astype(np.int64)
            if len(mpos) != 2 or abs(int(mpos[0]) - int(mpos[1])) < dist:
                safe = False
                break
            for q in cand_pos[b][sel].astype(np.int64):
                if q in (mpos[0], mpos[1]):
                    continue
                if (abs(q - int(mpos[0])) < dist
                        or abs(q - int(mpos[1])) < dist):
                    safe = False
                    break
            if not safe:
                break
        if safe:
            out[b] = False
    return out


def select_peaks_host(cand_pos: np.ndarray, cand_h: np.ndarray,
                      min_dist: int):
    """Host stage: exact scipy distance selection per read.

    Returns a list of int64 arrays (ascending peak positions)."""
    from ..ref.peaks import select_by_distance

    out = []
    for b in range(cand_pos.shape[0]):
        sel = cand_pos[b] >= 0
        pos = cand_pos[b][sel].astype(np.int64)
        h = cand_h[b][sel].astype(np.float64)
        if len(pos) == 0:
            out.append(np.zeros(0, dtype=np.int64))
            continue
        # candidates arrive (winner-slots, runner-up-slots): sort by
        # position — select_by_distance walks sorted neighbors
        o = np.argsort(pos, kind="stable")
        pos, h = pos[o], h[o]
        keep = select_by_distance(pos, h, min_dist)
        out.append(pos[keep])
    return out


def call_peaks_batch(smoothed, lens, min_dist, max_peaks: int = 128):
    """Convenience wrapper (device candidates + host selection) with the
    original API: returns (positions (B, K) int32 ascending / L-padded,
    n_peaks (B,) int32, med (B,) f32).

    Reads flagged ``deep`` (a tile held >2 surviving maxima — the only
    case where compaction can diverge from scipy) are re-run through the
    exact host selection on their full smoothed row, so the result is
    scipy-exact at any chain depth."""
    from ..ref.peaks import call_peaks as ref_call_peaks

    B, L = smoothed.shape
    tile = tile_for_distance(int(min_dist))
    cand_pos, cand_h, med, _height, _gated, deep, marg = \
        peak_candidates_batch(jnp.asarray(smoothed), jnp.asarray(lens),
                              tile=tile)
    cand_pos, cand_h = np.asarray(cand_pos), np.asarray(cand_h)
    peaks = select_peaks_host(cand_pos, cand_h, int(min_dist))
    deep = np.asarray(deep)
    marg = np.asarray(marg) | margin_competitors_host(
        cand_pos, cand_h, int(min_dist))
    if deep.any() or marg.any():
        from ..utils import prof as _prof
        if deep.any():
            _prof.current.count("peaks_deep_host_rerun", int(deep.sum()))
        if (marg & ~deep).any():
            _prof.current.count("peaks_margin_host_rerun",
                                int((marg & ~deep).sum()))
        deep = deep | marg
    sm_np = np.asarray(smoothed)
    lens_np = np.asarray(lens)
    K = max_peaks
    pos = np.full((B, K), L, dtype=np.int32)
    n = np.zeros(B, dtype=np.int32)
    for b, p in enumerate(peaks):
        if deep[b]:
            # exact selection on THIS function's input row (its contract
            # takes the already-smoothed profile; consumers with raw
            # reads use ref.peaks.exact_peaks_rerun instead)
            p, _m = ref_call_peaks(sm_np[b, :lens_np[b]].astype(np.float64),
                                   int(min_dist))
        k = min(len(p), K)
        pos[b, :k] = p[:k]
        n[b] = k
    return pos, n, np.asarray(med)
