"""Batched peak calling (device kernel).

scipy.signal.find_peaks(distance=, height=) with the reference's noise gates
(bin/call_peaks.py:13-15), vectorised over a (B, L) block of smoothed
profiles.  Semantics match ``ref/peaks.py`` (which is tested against scipy):

- local maxima with plateau midpoints,
- gate: no peaks when max < 6 * median (numpy median: mean of the two
  middle order statistics over the *valid* region),
- height threshold 3 * median,
- distance selection in scipy's priority order (height desc, rightmost
  first among equals), removing peaks strictly closer than ceil(distance).

Peak counts per read are tiny (#repeats <= ~50), so candidates are reduced
to the top ``K`` by height before the O(K^2) distance selection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.int32(2 ** 30)
NEG_F = jnp.float32(-3.0e38)


def masked_median(x: jax.Array, lens: jax.Array) -> jax.Array:
    """numpy-median over the first lens[b] entries of each row."""
    B, L = x.shape
    pad = jnp.where(jnp.arange(L)[None, :] < lens[:, None], x, jnp.inf)
    s = jnp.sort(pad, axis=1)
    lo = jnp.take_along_axis(s, ((lens - 1) // 2)[:, None], axis=1)
    hi = jnp.take_along_axis(s, (lens // 2)[:, None], axis=1)
    return ((lo + hi) * 0.5)[:, 0]


@partial(jax.jit, static_argnames=("max_peaks",))
def call_peaks_batch(smoothed: jax.Array, lens: jax.Array, min_dist: jax.Array,
                     max_peaks: int = 128):
    """smoothed: (B, L) f32 (zero beyond lens); lens: (B,) int32;
    min_dist: scalar int32.

    Returns (positions (B, K) int32 ascending with L as padding,
             n_peaks (B,) int32, median (B,) f32).
    """
    B, L = smoothed.shape
    K = max_peaks
    lens = lens.astype(jnp.int32)
    x = smoothed.astype(jnp.float32)
    jidx = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = jidx < lens[:, None]
    xm = jnp.where(valid, x, NEG_F)

    med = masked_median(x, lens)
    xmax = jnp.max(xm, axis=1)
    gated = xmax < 6.0 * med          # (B,) True -> no peaks
    height = 3.0 * med

    # ---- local maxima with plateau midpoints (scipy _local_maxima_1d) ----
    # next-change index nc[j] = smallest k > j with x[k] != x[j]
    diff_next = jnp.concatenate(
        [xm[:, :-1] != xm[:, 1:], jnp.ones((B, 1), dtype=bool)], axis=1)
    cand_idx = jnp.where(diff_next, jidx + 1, BIG)
    nc = jax.lax.associative_scan(jnp.minimum, cand_idx, axis=1, reverse=True)

    left_edge = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), xm[:, 1:] > xm[:, :-1]], axis=1)
    # value after the plateau must be strictly smaller and inside the array
    i_ahead = nc
    ahead_ok = i_ahead <= lens[:, None] - 1
    x_ahead = jnp.take_along_axis(xm, jnp.minimum(i_ahead, L - 1), axis=1)
    is_peak_edge = left_edge & ahead_ok & (x_ahead < xm)
    midpoint = (jidx + i_ahead - 1) // 2

    # scatter peak heights onto midpoints
    scatter_to = jnp.where(is_peak_edge, midpoint, L - 1)
    peak_mask = jnp.zeros((B, L), dtype=bool)
    peak_mask = peak_mask.at[
        jnp.arange(B)[:, None], scatter_to].max(is_peak_edge)

    ok = peak_mask & (xm >= height[:, None]) & ~gated[:, None]
    cand_scores = jnp.where(ok, xm, NEG_F)

    # ---- top-K candidates by height ----
    vals, pos = jax.lax.top_k(cand_scores, K)       # (B, K), height desc
    alive = vals > NEG_F / 2

    # scipy priority: height desc, then larger position first.
    # top_k gives height desc with smaller position first on ties -> reorder
    # ties by sorting on (-height, -position) lexicographically.
    orderkey = (-vals, -pos.astype(jnp.float32))
    perm = jnp.lexsort(orderkey[::-1], axis=1) if hasattr(jnp, "lexsort") else None
    if perm is None:  # fallback: stable double argsort
        perm = jnp.argsort(-pos, axis=1, stable=True)
        perm = jnp.take_along_axis(
            perm, jnp.argsort(jnp.take_along_axis(-vals, perm, axis=1),
                              axis=1, stable=True), axis=1)
    vals = jnp.take_along_axis(vals, perm, axis=1)
    pos = jnp.take_along_axis(pos, perm, axis=1)
    alive = jnp.take_along_axis(alive, perm, axis=1)

    # ---- greedy distance selection in priority order ----
    dist = jnp.ceil(min_dist).astype(jnp.int32)

    def body(k, keep):
        p_k = pos[:, k]                       # (B,)
        active = keep[:, k] & alive[:, k]
        too_close = (jnp.abs(pos - p_k[:, None]) < dist) & \
            (jnp.arange(K)[None, :] != k)
        return jnp.where(active[:, None], keep & ~too_close, keep)

    keep = jax.lax.fori_loop(0, K, body, jnp.ones((B, K), dtype=bool))
    keep = keep & alive

    # ---- emit positions ascending, padded with L ----
    out_pos = jnp.where(keep, pos, L)
    out_pos = jnp.sort(out_pos, axis=1)
    n = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out_pos.astype(jnp.int32), n, med
