"""Fused splint-locate kernel: profile -> combo select -> smooth -> peak
candidates, one jitted launch per (B, C, L) bucket; the tiny
distance-selection step finishes on the host (see kernels/peaks.py).

Replaces, for a whole batch of reads, the reference's per-read BLAT
preprocess (splint identity + strand, bin/preprocess.py), conk scoring
(C3POa.py:123) and call_peaks (bin/call_peaks.py).  Only O(B) scalars and
O(B * L/tile) candidate slots leave the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .peaks import peak_candidates_batch, select_peaks_host, tile_for_distance
from .smooth import smooth3_batch
from .sw_profile import start_profile_batch


def profile_opts(B: int, L: int) -> tuple:
    """Resolve the profile-kernel configuration from the environment at
    HOST level (hashable static tuple).  Must be called per launch by the
    non-jitted wrapper — env vars read inside a jitted function are baked
    in at trace time, so in-process toggles (tools/pipe_ab.py,
    tools/hw_parity.py A/B arms) would silently compare a kernel against
    itself (round-2 advisor finding).

    Returns (use_pallas, phased, early, b_tile, tile_l)."""
    import os
    use_pallas = (os.environ.get("C3POA_USE_PALLAS", "1") != "0" and
                  jax.default_backend() not in ("cpu",) and
                  B % 8 == 0 and L % 2048 == 0)
    # C3POA_PROFILE_PHASED: per-phase closure level counts (~20%
    # fewer closure ops, bit-identical) — default ON after the
    # on-hardware interleaved A/B (subprocess arms, tools/pipe_ab.py).
    # C3POA_PROFILE_EARLY=1 additionally early-exits each row's closure
    # at its fixpoint (exact, but measured SLOWER: 16 vs 25 G c/s — the
    # while-loop and its convergence reduce cost more than the skipped
    # passes).
    #
    # Fat tiles: (b_tile, tile_l) = (16, 4096) measured 52 G c/s vs
    # 24 for the original (8, 2048) at (512, 32768, C=2, m=288) —
    # fewer, wider vector ops amortize the per-op Mosaic overhead,
    # and the wider tile cuts the OV-overlap redundancy 1.25x ->
    # 1.125x.  The sweep plateaus ~53 at (8-16, 8192); 4096 keeps
    # end-tile skipping twice as fine.  Shapes that don't divide
    # fall back to the narrower tiling.
    bt = int(os.environ.get("C3POA_PROFILE_BT",
                            "16" if B % 16 == 0 else "8"))
    tl = int(os.environ.get("C3POA_PROFILE_TL",
                            "4096" if L % 4096 == 0 else "2048"))
    return (use_pallas,
            os.environ.get("C3POA_PROFILE_PHASED", "1") == "1",
            os.environ.get("C3POA_PROFILE_EARLY", "0") == "1",
            bt, tl)


def _profile_impl(reads, splints, lens=None, popts=None):
    """Profile kernel selection.

    The Pallas kernel (kernels/pallas_profile.py) is bit-identical and the
    default on accelerators: measured on the v5e it sustains 15.1 G
    cells/s at (512, 32768, C=2, m=288) vs 3.2 G for the XLA scan — a
    4.8x speedup that holds from B=64 up (tools/kernel_bench.py), and it
    skips read tiles past every read's end (callers chunk length-sorted).
    The XLA scan remains the CPU/test path and the fallback for shapes the
    kernel's tiling cannot take (B % 8 or L % 2048 != 0 — the backend's
    buckets always satisfy both).  Set C3POA_USE_PALLAS=0 to force XLA.

    ``popts`` is the profile_opts() tuple resolved by the caller at host
    level; None (direct jitted-callsite use, e.g. tests) resolves here —
    at trace time, so such callers cannot flip env vars in-process."""
    B, L = reads.shape
    if popts is None:
        popts = profile_opts(B, L)
    use_pallas, phased, early, bt, tl = popts
    if use_pallas:
        from .pallas_profile import start_profile_pallas
        return start_profile_pallas(
            reads, splints, lens,
            phased=phased, early=early, b_tile=bt, tile_l=tl)
    return start_profile_batch(reads, splints)


def pack_b5(reads_np):
    """Host side: pack (B, L) int8 codes 0..4 into (B, ceil(L/3)) int8,
    3 base-5 digits per byte (max 124).  Exact for the full alphabet
    incl. the pad code 4, unlike 2-bit packing.  Cuts the host->device
    upload 3x on relayed runtimes where transfer is serialized."""
    import numpy as np
    B, L = reads_np.shape
    Lp = -(-L // 3) * 3
    if Lp != L:
        reads_np = np.pad(reads_np, ((0, 0), (0, Lp - L)),
                          constant_values=4)
    r = reads_np.astype(np.int8)
    return r[:, 0::3] + 5 * r[:, 1::3] + 25 * r[:, 2::3]


@partial(jax.jit, static_argnames=("L",))
def unpack_b5_device(packed, L: int):
    """Standalone jitted device unpack (pack_b5 inverse) for callers
    that feed other jitted kernels — e.g. the align path's packed
    uploads (C3POA_PACK_ALIGN): the (B, L/3) upload is expanded to
    (B, L) ON DEVICE, so the kernels consume a resident array with no
    second host transfer."""
    return _unpack_b5(packed, L)


def _unpack_b5(packed, L):
    """Device side: inverse of pack_b5, back to (B, L) int8."""
    r = packed.astype(jnp.int32)
    parts = jnp.stack([r % 5, (r // 5) % 5, r // 25], axis=2)
    B = packed.shape[0]
    return parts.reshape(B, -1)[:, :L].astype(jnp.int8)


def profile_rows(reads, lens, splints):
    """Profile-only launch for flagged-read reruns: (B, C, L) int32,
    bit-exact vs ref.sw.start_profile.  Callers batch flagged reads in
    fixed chunks of 8 rows so each L bucket compiles exactly one extra
    (8, C, L) program; the f64 decisions then rerun on the host
    (ref.peaks.exact_peaks_from_profile) without the O(m*n) host DP
    that made margin/deep reruns ~1 s/read."""
    B, L = reads.shape
    return _profile_rows_jit(reads, lens, splints,
                             popts=profile_opts(B, L))


@partial(jax.jit, static_argnames=("popts",))
def _profile_rows_jit(reads, lens, splints, popts=None):
    return _profile_impl(reads, splints, lens, popts)


def profile_rows_combo(reads, lens, splints, combo):
    """Flagged-read rerun fetch, combo-selected on device: (B, L) int32
    — the already-chosen combo's exact profile row (an exact gather of
    the same int32 DP ``profile_rows`` returns, so bit-parity is
    unchanged) at HALF the download of the full (B, C, L) block.
    ``combo`` is (B,) int32 (dummy rows 0)."""
    B, L = reads.shape
    return _profile_rows_combo_jit(reads, lens, splints, combo,
                                   popts=profile_opts(B, L))


@partial(jax.jit, static_argnames=("popts",))
def _profile_rows_combo_jit(reads, lens, splints, combo, popts=None):
    prof = _profile_impl(reads, splints, lens, popts)   # (B, C, L) int32
    return jnp.take_along_axis(
        prof, combo.astype(jnp.int32)[:, None, None], axis=1)[:, 0, :]


def locate_device(reads: jax.Array, lens: jax.Array, splints: jax.Array,
                  tile: int = 64, unpack_l: int | None = None):
    """reads (B, L) int8 pad 4; lens (B,) int32; splints (C, m) int8 pad 4.
    With ``unpack_l``, ``reads`` is pack_b5-packed and unpacked on device
    to (B, unpack_l) first.

    Returns (combo (B,) int32, best_score (B,) int32,
             cand_pos (B, L/tile) int32, cand_h (B, L/tile) f32,
             med (B,) f32, deep (B,) bool, margin (B,) bool).

    ``deep`` marks reads needing the exact host peak rerun (a tile held
    more than the 2 candidates the compaction keeps — kernels/peaks.py);
    ``margin`` marks reads whose f32 threshold comparisons sit within
    MARGIN_REL of the 3x/6x-median gates (same exact rerun, separate
    counter).

    Non-jitted wrapper: resolves the profile-kernel env configuration at
    host level on EVERY call and passes it to the jitted body as a static
    arg, so in-process env flips select a different compiled program
    instead of being silently baked in at first trace."""
    B, L = reads.shape
    if unpack_l is not None:
        L = unpack_l
    return _locate_device_jit(reads, lens, splints, tile=tile,
                              unpack_l=unpack_l, popts=profile_opts(B, L))


@partial(jax.jit, static_argnames=("tile", "unpack_l", "popts"))
def _locate_device_jit(reads: jax.Array, lens: jax.Array,
                       splints: jax.Array, tile: int = 64,
                       unpack_l: int | None = None, popts: tuple = None):
    if unpack_l is not None:
        reads = _unpack_b5(reads, unpack_l)
    prof = _profile_impl(reads, splints, lens, popts)   # (B, C, L) int32
    per_combo = jnp.max(prof, axis=2)                   # (B, C)
    combo = jnp.argmax(per_combo, axis=1).astype(jnp.int32)
    best_score = jnp.max(per_combo, axis=1)
    chosen = jnp.take_along_axis(
        prof, combo[:, None, None], axis=1)[:, 0, :]    # (B, L)
    sm = smooth3_batch(chosen.astype(jnp.float32), lens)
    cand_pos, cand_h, med, _height, _gated, deep, margin = \
        peak_candidates_batch(sm, lens, tile=tile)
    return combo, best_score, cand_pos, cand_h, med, deep, margin


def locate_batch(reads, lens, splints, min_dist, max_peaks: int = 128):
    """Device locate + host distance selection, original array API:
    returns (combo (B,), best_score (B,), peak_pos (B, K) int32 ascending
    / L-padded, n_peaks (B,) int32)."""
    B, L = np.shape(reads)
    tile = tile_for_distance(int(min_dist))
    combo, best_score, cand_pos, cand_h, _med, deep, marg = locate_device(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(splints),
        tile=tile)
    cand_pos, cand_h = np.asarray(cand_pos), np.asarray(cand_h)
    peaks = select_peaks_host(cand_pos, cand_h, int(min_dist))
    # deep/margin-flagged reads: the shared exact host rerun (rare by
    # construction; counted so a rate spike is never silent)
    from .peaks import margin_competitors_host
    deep = np.asarray(deep)
    marg = np.asarray(marg) | margin_competitors_host(
        cand_pos, cand_h, int(min_dist))
    if deep.any() or marg.any():
        from ..ref.peaks import exact_peaks_from_profile
        from ..utils import prof as _prof
        if deep.any():
            _prof.current.count("peaks_deep_host_rerun", int(deep.sum()))
        if (marg & ~deep).any():
            _prof.current.count("peaks_margin_host_rerun",
                                int((marg & ~deep).sum()))
        deep = deep | marg
        combo_np = np.asarray(combo)
        reads_np = np.asarray(reads)
        lens_np = np.asarray(lens)
        flagged = np.flatnonzero(deep)
        # fetch the flagged reads' EXACT device profiles in chunks of 8
        # (one extra compiled shape per L bucket), then redo only the
        # f64 float decisions on the host
        for c0 in range(0, len(flagged), 8):
            chunk = flagged[c0:c0 + 8]
            R8 = np.full((8, L), 4, dtype=np.int8)
            l8 = np.full(8, 64, dtype=np.int32)
            R8[:len(chunk)] = reads_np[chunk]
            l8[:len(chunk)] = lens_np[chunk]
            prof8 = np.asarray(profile_rows(
                jnp.asarray(R8), jnp.asarray(l8), jnp.asarray(splints)))
            for r, b in enumerate(chunk):
                row = prof8[r, combo_np[b], :lens_np[b]]
                peaks[b] = exact_peaks_from_profile(
                    row, int(min_dist)).astype(np.int64)
    K = max_peaks
    pos = np.full((B, K), L, dtype=np.int32)
    n = np.zeros(B, dtype=np.int32)
    for b, p in enumerate(peaks):
        k = min(len(p), K)
        pos[b, :k] = p[:k]
        n[b] = k
    return np.asarray(combo), np.asarray(best_score), pos, n
