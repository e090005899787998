"""TPU compute backend: length-bucketed batched kernel launches.

Replaces the reference's per-read native calls (conk, BLAT, abPOA inner
alignments, racon) with a handful of compiled kernel shapes:

- ``locate_many``: reads are bucketed by padded length (powers of two) and
  batched through the fused locate kernel (``kernels/locate.py``); only
  combo ids, scores and peak indices return to the host.
- ``align_many``: (query, target) pairs are bucketed by padded
  (nq, nt) and batched through the banded aligner
  (``kernels/banded.py``); move blocks come back for host traceback +
  indel normalization (C fast path in native/, numpy fallback here).

Bucket shapes are fixed (padded batch sizes) so each (B, C, L) / (P, nq, nt)
combination compiles exactly once per process.
"""

from __future__ import annotations

import os

import numpy as np

from .. import native
from ..consensus.engine import ConsensusParams
from ..consensus.vote import SubreadAln
from ..kernels.banded import SMAX, banded_align_trace_batch, ops_to_record
from ..ref.banded import normalize_record
from .backend import LocateResult, NumpyBackend

# read-length buckets (L); reads longer than the last bucket fall back to
# the exact numpy locate path (locate_many), so no read is ever truncated.
# COARSE ladder since round 5: the profile kernel skips dead 16-row x
# 4096-col tiles past every read's end (length-sorted chunks), so padded
# rows are nearly free, while every extra launch pays 30-50 ms of relay
# dispatch — the round-5 interleaved A/B measured (32768, 131072) at
# 1.273x over the old 5-bucket ladder (won 4/4 rounds: 1.32/1.17/1.40/
# 1.23, BENCHMARKS.md).  Most groups now locate in ONE launch.
# Powers of two ONLY — this environment's compile cache silently drops
# non-pow2 locate shapes (a 49152 bucket recompiled ~170s every process).
LEN_BUCKETS = (32768, 131072)


_LEN_BUCKET_CACHE: dict = {}


def _len_buckets() -> tuple[int, ...]:
    """The locate bucket ladder, env-overridable per call
    (C3POA_LOCATE_BUCKETS="32768,131072").  Fewer buckets = fewer
    launches per group; the profile kernel's per-16-row-tile end
    skipping makes the extra padded tiles nearly free (a dead tile is
    one VMEM zeros write), so on dispatch-overhead-dominated relays a
    coarser ladder wins.

    Overrides are validated once per distinct env value (cached): every
    bucket must be a power of two (this environment's compile cache
    silently drops non-pow2 locate shapes — ~170s recompile per process)
    and a multiple of 4096 (the profile kernel's fat tile; non-multiples
    of 2048 would silently fall back to the slow XLA scan), and the
    ladder is sorted ascending (_bucket_len assumes it)."""
    env = os.environ.get("C3POA_LOCATE_BUCKETS")
    if not env:
        return LEN_BUCKETS
    cached = _LEN_BUCKET_CACHE.get(env)
    if cached is not None:
        return cached
    try:
        buckets = tuple(sorted(int(x) for x in env.split(",") if x.strip()))
    except ValueError as exc:
        raise ValueError(
            f"C3POA_LOCATE_BUCKETS={env!r}: not a comma-separated int "
            f"list") from exc
    if not buckets:
        raise ValueError(f"C3POA_LOCATE_BUCKETS={env!r}: empty ladder")
    bad = [b for b in buckets if b < 4096 or b & (b - 1) or b % 4096]
    if bad:
        raise ValueError(
            f"C3POA_LOCATE_BUCKETS={env!r}: buckets {bad} must be "
            f"powers of two >= 4096 (non-pow2 shapes recompile every "
            f"process; non-multiples of 4096 drop the Pallas profile "
            f"kernel)")
    _LEN_BUCKET_CACHE[env] = buckets
    return buckets


# device state budget for the locate kernel: B*C*L int32 elements
LOCATE_BUDGET = 64 << 20
# move-block budget for the aligner: P*nq*W bytes.  The scan is
# per-row-overhead-bound (halving the band leaves time unchanged,
# tools/kernel_bench.py), so bigger P is nearly free throughput:
# 512 -> 2048 pairs/batch measured 1873 -> 2751 pairs/s on the v5e.
ALIGN_BUDGET = 1 << 30


def _bucket_len(n: int) -> int:
    bk = _len_buckets()
    for b in bk:
        if n <= b:
            return b
    return bk[-1]


def _pow2_at_least(n: int, lo: int = 128) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _pow2_at_most(n: int, lo: int = 8) -> int:
    b = lo
    while b * 2 <= n:
        b *= 2
    return b


# Batch-size ladder: only these sizes are ever compiled (shapes are padded
# up), keeping the number of distinct compiled programs per bucket tiny.
_P_LADDER = (8, 64, 128, 256, 512, 1024, 2048)


def _p_ladder() -> tuple[int, ...]:
    """Batch-size ladder, max env-overridable per call
    (C3POA_P_LADDER_MAX=4096): each doubling past 2048 halves the launch
    count of a full group at ~flat per-row device cost, at the price of
    one more compiled shape per bucket."""
    mx = int(os.environ.get("C3POA_P_LADDER_MAX", "2048"))
    # clamp to the ladder floor and round down to a power of two: a
    # sub-8 or non-pow2 max would otherwise produce an empty ladder
    # (IndexError) or batch shapes outside the compile-once set
    mx = max(mx, _P_LADDER[0])
    mx = _pow2_at_most(mx, _P_LADDER[0])
    lad = [s for s in _P_LADDER if s <= mx]
    while lad[-1] * 2 <= mx:
        lad.append(lad[-1] * 2)
    return tuple(lad)


def _batch_size(n_items: int, budget_items: int) -> int:
    """Compile-once batch size from a small fixed ladder, within budget."""
    ladder = _p_ladder()
    cap = _pow2_at_most(max(budget_items, ladder[0]), ladder[0])
    for s in ladder:
        if s >= n_items:
            return min(s, cap)
    return min(ladder[-1], cap)


def _chunk_sizes(n_items: int, budget_items: int,
                 launch_cost_rows: int = 256):
    """Per-chunk ladder sizes covering n_items.

    Greedy with a cost model: one extra launch costs about
    ``launch_cost_rows`` padded rows of compute (relay dispatch is
    30-50 ms; a padded row's cost depends on the kernel), so a covering
    size whose padding stays below that is one launch, and a larger
    overhang is split into a full chunk plus a tail."""
    ladder = _p_ladder()
    cap = _pow2_at_most(max(budget_items, ladder[0]), ladder[0])
    out = []
    left = n_items
    while left > 0:
        cover = None
        for s in ladder:
            if s >= left and s <= cap:
                cover = s
                break
        below = max((s for s in ladder if s <= min(left, cap)),
                    default=min(ladder[0], cap))
        if cover is not None and (cover - left) <= launch_cost_rows:
            out.append(cover)
            return out
        out.append(below)
        left -= below
    return out


def _bucket_dim(n: int, lo: int = 128) -> int:
    """Smallest of {2^k, 1.5 * 2^k} >= n.  The align scan's cost is rows
    (per-row overhead dominates), so 1.5x intermediate buckets cut ~25%
    padded rows versus pure powers of two at the cost of a few more
    compiled shapes."""
    b = lo
    while True:
        if n <= b:
            return b
        if n <= b + b // 2:
            return b + b // 2
        b *= 2


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map with the varying-manual-axes check off: the kernel
    bodies initialize scan carries from literals, which the VMA checker
    flags as unvarying vs the data-sharded outputs (a false positive for
    these pure per-shard batch kernels)."""
    import jax
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)


def _pallas_align_on() -> bool:
    """Accelerator align path selection, mirroring
    kernels/locate._profile_impl.  C3POA_ALIGN_PALLAS=0/1 overrides this
    stage alone; C3POA_USE_PALLAS=0 forces XLA everywhere."""
    import jax
    on = os.environ.get("C3POA_ALIGN_PALLAS",
                        os.environ.get("C3POA_USE_PALLAS", "1"))
    return on != "0" and jax.default_backend() not in ("cpu",)


def _align_trace_impl(Q, T, ql, tl, *, band, match, mismatch, gap_open,
                      gap_ext):
    """On accelerators: Pallas forward (bit-identical to the XLA scan;
    1.4-1.9x at the shipped batch shapes, tools/kernel_bench.py) + the
    word-cached walk, whose ops come out 2-bit packed with gaps
    (kernels/banded.walk_ops_cached).  The XLA scan + plain walk remains
    the CPU/test/mesh path.  The row-chunked forward grid keeps the
    move-word out block VMEM-resident at (p_tile, 64, W) regardless of
    nq, so every bucket of the ladder (incl. 6144+, where the old
    monolithic block OOMed scoped VMEM) takes the Pallas path.
    Returns (result, ops_packed)."""
    if _pallas_align_on():
        from ..kernels.pallas_banded import banded_align_trace_pallas_cached
        # Round-4 defaults: FAT tiles + fold + raised scoped-VMEM limit.
        # The align forward is per-op-issue-bound, so more pairs per op
        # dilutes the fixed cost: launch-level sweep (tools/align_sweep)
        # measured pt256+fold+vmem128 at 1.40x over pt32 (2.12 G c/s),
        # and interleaved end-to-end A/Bs (tools/pipe_ab) 1.088x over the
        # round-3 default and 1.033x over pt128+fold+vmem64.  Buckets
        # past 2048 rows step the tile down (compile time of fat tiles
        # grows steeply with nq; pt384+ was pathological even at 2048).
        nq_b = Q.shape[1]
        pt_default = "256" if nq_b <= 2048 else (
            "128" if nq_b <= 4096 else "64")
        pt = int(os.environ.get("C3POA_ALIGN_PTILE", pt_default))
        # small launches (ladder tails) must not pad up to a fat tile:
        # a padded pair adds lane work per block, and 8x padding undoes
        # the per-op dilution win
        pcap = 8
        while pcap < Q.shape[0]:
            pcap *= 2
        pt = min(pt, pcap)
        # C3POA_ALIGN_PIPE=2 interleaves two independent DP half-states
        # per tile (software pipelining of the row dependency chain);
        # C3POA_WALK_WIDE=1 runs the two-word-row walk cache (half the
        # serial gathers).  Both off by default pending on-hardware
        # end-to-end A/Bs.
        nh = int(os.environ.get("C3POA_ALIGN_PIPE", "1"))
        if pt % (8 * nh):
            nh = 1
        wide = os.environ.get("C3POA_WALK_WIDE", "0") == "1"
        # C3POA_ALIGN_FOLD (default ON since round 4; implies the
        # super-block body): one fused [H|E|buf] shift per row instead
        # of three _sel_shifts — parity alone at thin tiles (r3: 1.04x),
        # stacks with fat tiles (see pt_default above).
        # C3POA_ALIGN_SB=1 alone: super-block without the fold.
        fold = os.environ.get("C3POA_ALIGN_FOLD", "1") == "1"
        sb = fold or os.environ.get("C3POA_ALIGN_SB", "0") == "1"
        # C3POA_ALIGN_VMEM_MB raises Mosaic's 16 MB scoped-VMEM default
        # so fatter p_tiles compile (static arg -> distinct compilations)
        vmem_mb = int(os.environ.get("C3POA_ALIGN_VMEM_MB", "128"))
        if fold and not vmem_mb:
            # the fused [H|E|buf] temps push p_tile=64 past the 16 MB
            # scoped-VMEM limit (measured 16.95M at nq=1536); 48 fits
            pt = min(pt, 48)
        # C3POA_ALIGN_EARLY=1: convergence early-exit on the F
        # prefix-max (bit-identical; lane rolls are ~74 ns each and the
        # 7 doubling levels dominate the row chain — see
        # tools/mosaic_floor_probe.py).  Off until the end-to-end A/B.
        early = os.environ.get("C3POA_ALIGN_EARLY", "0") == "1"
        return banded_align_trace_pallas_cached(
            Q, T, ql, tl, band=band, match=match, mismatch=mismatch,
            gap_open=gap_open, gap_ext=gap_ext, p_tile=pt, nh=nh,
            wide_walk=wide, superblock=sb, fold=fold,
            vmem_mb=vmem_mb, early=early and sb), True
    return banded_align_trace_batch(
        Q, T, ql, tl, band=band, match=match, mismatch=mismatch,
        gap_open=gap_open, gap_ext=gap_ext), False


class TpuBackend:
    supports_overlap = True

    def __init__(self, band: int | None = None, max_peaks: int = 128,
                 mesh=None):
        """``mesh``: a 1-D ``jax.sharding.Mesh`` (axis "data") to shard
        every kernel batch over the host's chips — the multi-chip
        data-parallel execution path.  None = single-device jit."""
        import jax  # fail early if jax is unusable

        # persistent compilation cache: bucket shapes compile once per
        # machine, not once per process
        try:
            cache_dir = os.environ.get(
                "C3POA_JAX_CACHE", os.path.expanduser("~/.cache/c3poa_jax"))
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
        self.max_peaks = max_peaks
        self.mesh = mesh
        self._splint_cache: dict = {}
        self._sharded_fns: dict = {}
        self._seen_shapes: set = set()  # compile-count telemetry

    def _round_batch(self, B: int) -> int:
        """Pad batch sizes to a multiple of the mesh size."""
        if self.mesh is None:
            return B
        n = self.mesh.devices.size
        return -(-B // n) * n

    def _sharded_locate(self, tile: int):
        """locate_device shard_mapped over the mesh's batch dim with the
        splint reference replicated (compiled once per tile).  shard_map
        (not jit-with-shardings) so each device runs the full kernel —
        including the Pallas profile path on real TPU meshes, where a
        pallas_call under plain pjit would not partition."""
        key = ("locate", tile)
        if key not in self._sharded_fns:
            import jax
            from jax.sharding import PartitionSpec as P

            from ..kernels.locate import locate_device
            fn = _shard_map(
                lambda r, ln, s: locate_device(r, ln, s, tile=tile),
                self.mesh,
                (P("data", None), P("data"), P(None, None)),
                (P("data"), P("data"), P("data", None),
                 P("data", None), P("data"), P("data"), P("data")))
            self._sharded_fns[key] = jax.jit(fn)
        return self._sharded_fns[key]

    def _sharded_align(self, band, match, mismatch, gap_open, gap_ext):
        """Banded align+walk shard_mapped over the batch dim: each device
        runs _align_trace_impl, so real TPU meshes take the Pallas
        forward exactly like the single-chip path.  Returns (fn, packed):
        the ops encoding is captured when the fn is BUILT — re-reading
        the env at call time could disagree with the compiled fn if
        C3POA_ALIGN_PALLAS is toggled mid-run."""
        key = ("align", band, match, mismatch, gap_open, gap_ext)
        if key not in self._sharded_fns:
            import jax
            from jax.sharding import PartitionSpec as P

            fn = _shard_map(
                lambda q, t, ql, tl: _align_trace_impl(
                    q, t, ql, tl, band=band, match=match,
                    mismatch=mismatch, gap_open=gap_open,
                    gap_ext=gap_ext)[0],
                self.mesh,
                (P("data", None), P("data", None), P("data"), P("data")),
                (P("data"), P("data"), P("data"), P("data"),
                 P("data", None), P("data")))
            self._sharded_fns[key] = (jax.jit(fn), _pallas_align_on())
        return self._sharded_fns[key]

    def _sharded_adapters(self, match, mismatch, gap):
        """adapter_hits_batch shard_mapped over the read batch with the
        adapter reference replicated (postprocess role)."""
        key = ("adapters", match, mismatch, gap)
        if key not in self._sharded_fns:
            import jax
            from jax.sharding import PartitionSpec as P

            from ..kernels.adapters import adapter_hits_batch
            fn = _shard_map(
                lambda r, a, al: adapter_hits_batch(
                    r, a, al, match=match, mismatch=mismatch, gap=gap),
                self.mesh,
                (P("data", None), P(None, None), P(None)),
                tuple(P("data", None) for _ in range(6)))
            self._sharded_fns[key] = jax.jit(fn)
        return self._sharded_fns[key]

    # ---------------- locate ----------------

    def _splint_array(self, combos) -> np.ndarray:
        key = tuple(id(c.codes) for c in combos)
        if key not in self._splint_cache:
            # pad to a multiple of 32, not a power of two: the profile scan
            # costs one full row per padded char
            m = -(-max(len(c.codes) for c in combos) // 32) * 32
            S = np.full((len(combos), m), 4, dtype=np.int8)
            for i, c in enumerate(combos):
                S[i, :len(c.codes)] = c.codes
            self._splint_cache[key] = S
        return self._splint_cache[key]

    def locate_many(self, reads, combos, min_dist) -> list[LocateResult]:
        S = self._splint_array(combos)
        C = len(combos)
        out: list = [None] * len(reads)

        by_bucket: dict[int, list[int]] = {}
        overlong: list[int] = []
        lmax_bucket = _len_buckets()[-1]
        for i, codes in enumerate(reads):
            if len(codes) > lmax_bucket:
                # beyond the bucket ladder (>128 kb): the exact host path
                # locates the full read instead of truncating it — rare
                # enough that the O(m*n) numpy profile is fine
                overlong.append(i)
                continue
            by_bucket.setdefault(_bucket_len(len(codes)), []).append(i)
        if overlong:
            from ..utils import prof
            prof.current.count("overlong_reads_host_located", len(overlong))
            host = NumpyBackend()
            for i, r in zip(overlong, host.locate_many(
                    [reads[i] for i in overlong], combos, min_dist)):
                out[i] = r

        # dispatch all chunks first (device runs ahead), materialize after
        from ..kernels.locate import locate_device
        from ..kernels.peaks import select_peaks_host, tile_for_distance

        tile = tile_for_distance(int(min_dist))
        launches = []
        for L, idxs in sorted(by_bucket.items()):
            # longest-first within the bucket: the profile kernel skips
            # read tiles past every read's end per 8-read tile, so
            # grouping similar lengths maximizes skipped tiles
            idxs.sort(key=lambda i: -len(reads[i]))
            start = 0
            # a padded locate row costs L*C*m cells (~0.6 ms at L=16k),
            # so ~128 padded rows buy one extra relay dispatch
            for B in _chunk_sizes(len(idxs), LOCATE_BUDGET // (C * L),
                                  launch_cost_rows=128):
                B = self._round_batch(B)
                chunk = idxs[start:start + B]
                start += B
                if not chunk:
                    break
                R = np.full((B, L), 4, dtype=np.int8)
                lens = np.full(B, 64, dtype=np.int32)  # dummy rows: tiny+empty
                for r, i in enumerate(chunk):
                    codes = reads[i][:L]
                    R[r, :len(codes)] = codes
                    lens[r] = len(codes)
                from ..utils import prof
                prof.current.count("locate_launches")
                prof.current.count("locate_cells_padded", B * L * C)
                prof.current.count(
                    "locate_cells_real",
                    sum(min(len(reads[i]), L) for i in chunk) * C)
                shape = ("locate", B, C, L, tile)
                if shape not in self._seen_shapes:
                    self._seen_shapes.add(shape)
                    prof.current.count("locate_compiled_shapes")
                if self.mesh is not None:
                    res = self._sharded_locate(tile)(R, lens, S)
                elif os.environ.get("C3POA_PACK_UPLOAD", "1") == "1":
                    # base-5 pack: 3x smaller host->device read upload,
                    # unpacked on device (kernels/locate.pack_b5).
                    # DEFAULT ON: interleaved A/B measured 1.066x
                    # end-to-end (won all 3 rounds) — the win is mostly
                    # device-side (kernel+upload 547->439 ms at the
                    # 32768 bucket, tools/locate_breakdown.py), not the
                    # raw transfer (relay uploads run ~1.9 GB/s)
                    from ..kernels.locate import pack_b5
                    res = locate_device(pack_b5(R), lens, S, tile=tile,
                                        unpack_l=L)
                else:
                    res = locate_device(R, lens, S, tile=tile)
                launches.append((chunk, res))
        from ..kernels.peaks import margin_competitors_host
        deep_rerun: list[int] = []
        margin_rerun: list[int] = []
        for chunk, (combo, score, cand_pos, cand_h, _med, deep,
                    marg) in launches:
            combo, score = np.asarray(combo), np.asarray(score)
            cand_pos, cand_h = np.asarray(cand_pos), np.asarray(cand_h)
            peaks = select_peaks_host(cand_pos, cand_h, int(min_dist))
            deep = np.asarray(deep)
            marg = np.asarray(marg) | margin_competitors_host(
                cand_pos, cand_h, int(min_dist))
            for r, i in enumerate(chunk):
                out[i] = LocateResult(int(combo[r]), int(score[r]),
                                      peaks[r].astype(np.int64))
                if deep[r]:
                    deep_rerun.append(i)
                elif marg[r]:
                    margin_rerun.append(i)
        if deep_rerun or margin_rerun:
            # deep: a tile held >2 surviving maxima — the one case where
            # the top-2 compaction can diverge from scipy's selection.
            # margin: an f32 threshold/priority comparison sat within
            # the measured flip zone of the f64 spec path.  Both take
            # the ONE shared exact decision path (counted so a rate
            # spike is never silent): the EXACT int32 profile rows are
            # fetched from the device in chunks of 8 (one extra
            # compiled shape per L bucket) and only the f64 float
            # decisions rerun on the host — not the O(m*n) host DP.
            # Combo/score stay device-chosen — bit-parity with the host
            # by kernel tests — so only the peaks are recomputed.
            from ..kernels.locate import profile_rows_combo
            from ..ref.peaks import exact_peaks_from_profile
            from ..utils import prof
            if deep_rerun:
                prof.current.count("peaks_deep_host_rerun",
                                   len(deep_rerun))
            if margin_rerun:
                prof.current.count("peaks_margin_host_rerun",
                                   len(margin_rerun))
            flagged = sorted(deep_rerun + margin_rerun,
                             key=lambda i: len(reads[i]))
            # dispatch every fetch first (device runs ahead; each chunk
            # otherwise pays a full serial relay round-trip), then
            # materialize; the chosen combo's row is gathered ON device
            # (profile_rows_combo) — half the download, same exact int32
            # profile, so the f64 host decisions are unchanged.
            fetches = []
            for c0 in range(0, len(flagged), 8):
                chunk = flagged[c0:c0 + 8]
                Lb = _bucket_len(max(len(reads[i]) for i in chunk))
                R8 = np.full((8, Lb), 4, dtype=np.int8)
                l8 = np.full(8, 64, dtype=np.int32)
                c8 = np.zeros(8, dtype=np.int32)
                for r, i in enumerate(chunk):
                    codes = reads[i][:Lb]
                    R8[r, :len(codes)] = codes
                    l8[r] = len(codes)
                    c8[r] = out[i].combo
                fetches.append((chunk, l8,
                                profile_rows_combo(R8, l8, S, c8)))
            for chunk, l8, dev in fetches:
                prof8 = np.asarray(dev)
                for r, i in enumerate(chunk):
                    row = prof8[r, :l8[r]]
                    pks = exact_peaks_from_profile(row, min_dist)
                    out[i] = LocateResult(out[i].combo, out[i].score,
                                          pks.astype(np.int64))
        return out

    # ---------------- adapters (postprocessing) ----------------

    def adapter_hits(self, reads, combo_codes, combo_lens):
        from ..kernels.adapters import adapter_hits_batch

        C = len(combo_codes)
        m = _pow2_at_least(max(len(c) for c in combo_codes), 64)
        A = np.full((C, m), 4, dtype=np.int8)
        for c, codes in enumerate(combo_codes):
            A[c, :len(codes)] = codes
        alens = np.asarray(combo_lens, dtype=np.int32)

        B = len(reads)
        outs = [np.zeros((B, C), dtype=np.int64) for _ in range(6)]
        by_bucket: dict[int, list[int]] = {}
        overlong: list[int] = []

        def _adapter_bucket(n: int) -> int:
            # postprocess inputs are consensi (~0.5-3 kb), far below the
            # locate ladder's 8192 floor — denser power-of-two buckets
            # cut the adapter scan's padded columns ~4x
            for b in (1024, 2048, 4096):
                if n <= b:
                    return b
            return _bucket_len(n)

        lmax_bucket = _len_buckets()[-1]
        for i, codes in enumerate(reads):
            if len(codes) > lmax_bucket:
                overlong.append(i)  # exact host path, as in locate_many
                continue
            by_bucket.setdefault(_adapter_bucket(len(codes)), []).append(i)
        if overlong:
            host_res = NumpyBackend().adapter_hits(
                [reads[i] for i in overlong], combo_codes, combo_lens)
            for r, i in enumerate(overlong):
                for k in range(6):
                    outs[k][i] = host_res[k][r]
        for L, idxs in sorted(by_bucket.items()):
            P = self._round_batch(_batch_size(len(idxs), LOCATE_BUDGET // (C * L)))
            for start in range(0, len(idxs), P):
                chunk = idxs[start:start + P]
                R = np.full((P, L), 4, dtype=np.int8)
                for r, i in enumerate(chunk):
                    codes = reads[i][:L]
                    R[r, :len(codes)] = codes
                mt, mm, gp = NumpyBackend.ADAPTER_SCORING
                if self.mesh is not None:
                    res = self._sharded_adapters(mt, mm, gp)(R, A, alens)
                else:
                    res = adapter_hits_batch(R, A, alens, match=mt,
                                             mismatch=mm, gap=gp)
                res = [np.asarray(x) for x in res]
                for r, i in enumerate(chunk):
                    for k in range(6):
                        outs[k][i] = res[k][r]
        return outs

    # ---------------- align ----------------

    def align_many(self, pairs, params: ConsensusParams,
                   phase_base: int = 0) -> list[SubreadAln]:
        """``phase_base`` offsets the record-arena phase of this call's
        launches: a SECOND align_many within one group (the zero-repeat
        overlap batch) must not reuse the main call's arena phases while
        both calls' records are still alive (native.ops_records_batch)."""
        from ..consensus.engine import _pair_band
        from ..utils import prof
        prof.current.count(
            "align_pairs", len(pairs))
        prof.current.count(
            "align_cells",
            sum(len(pr[0]) * _pair_band(pr, params) for pr in pairs))
        with prof.current.stage("align"):
            return self._align_many(pairs, params, phase_base)

    def _align_many(self, pairs, params: ConsensusParams,
                    phase_base: int = 0) -> list[SubreadAln]:
        from ..consensus.engine import _pair_band
        out: list = [None] * len(pairs)

        serial: list[int] = []
        # (band, bucket dim m, pair idx): pairs may carry a per-pair band
        # (fast-band core pairs, ConsensusParams.fast_band) — chunks are
        # homogeneous in band so each launch compiles at its own W
        device: list[tuple[int, int, int]] = []
        for i, pr in enumerate(pairs):
            q, t = pr[0], pr[2]
            if len(t) > (SMAX - 1) * len(q) + 1:
                # extreme length mismatch: the banded kernel's shift ladder
                # (SMAX) cannot track the interpolated diagonal — rare, use
                # the host aligner
                serial.append(i)
                continue
            device.append((_pair_band(pr, params),
                           _bucket_dim(max(len(q), len(t))), i))
        if serial:
            from ..consensus.engine import serial_align_many
            res = serial_align_many([pairs[i] for i in serial], params)
            for i, r in zip(serial, res):
                out[i] = r

        # Launch cost is rows x f(P) with f nearly flat up to P=2048 (the
        # scan is per-row-overhead-bound), so pack pairs longest-first
        # into FULL ladder-size chunks and give each chunk the row bucket
        # of its own longest pair: fewer launches and fewer total padded
        # rows than launching every (nq) bucket separately.
        device.sort(key=lambda bmi: (bmi[0], -bmi[1], bmi[2]))
        chunks: list[tuple[int, int, list[int]]] = []  # (W, nq, pair idxs)
        start = 0
        while start < len(device):
            Wc = device[start][0]
            nq = device[start][1]
            cap = ALIGN_BUDGET // (nq * Wc)
            run = start
            while run < len(device) and device[run][0] == Wc:
                run += 1
            # never slice past the band run: the next run restarts the
            # length sort, so crossing it would put longer pairs into a
            # shorter chunk (and mix kernel widths)
            P = self._round_batch(_batch_size(run - start, cap))
            take = min(start + P, run)
            chunks.append((Wc, nq,
                           [i for _b, _m, i in device[start:take]]))
            start = take

        # dispatch all chunks first (device runs ahead of host traceback)
        launches = []
        for Wc, nq, chunk in chunks:
            nt = nq
            P = self._round_batch(_batch_size(len(chunk),
                                              ALIGN_BUDGET // (nq * Wc)))
            Q = np.full((P, nq), 4, dtype=np.int8)
            T = np.full((P, nt), 4, dtype=np.int8)
            ql = np.ones(P, dtype=np.int32)
            tl = np.ones(P, dtype=np.int32)
            for r, i in enumerate(chunk):
                pr = pairs[i]
                q, t = pr[0], pr[2]
                Q[r, :len(q)] = q
                T[r, :len(t)] = t
                ql[r], tl[r] = len(q), len(t)
            from ..utils import prof
            prof.current.count("align_launches")
            prof.current.count("align_cells_padded", P * nq * Wc)
            shape = ("align", P, nq, nt, Wc)
            if shape not in self._seen_shapes:
                self._seen_shapes.add(shape)
                prof.current.count("align_compiled_shapes")
            if self.mesh is not None:
                fn, packed = self._sharded_align(
                    Wc, params.match, params.mismatch, params.gap_open,
                    params.gap_ext)
                res = fn(Q, T, ql, tl)
            else:
                if os.environ.get("C3POA_PACK_ALIGN", "1") == "1":
                    # base-5 packed upload (3x smaller), expanded on
                    # device (kernels/locate.unpack_b5_device) — the
                    # align kernels then consume resident arrays.
                    # Bit-identical (test_packed_upload_align_parity).
                    # DEFAULT ON since round 5: interleaved A/B 1.136x
                    # (won 3/3 rounds; earlier rounds measured 1.007x-
                    # 1.041x, never a loss — the win grows when the
                    # relayed transfer path degrades, BENCHMARKS.md).
                    from ..kernels.locate import pack_b5, unpack_b5_device
                    Qd = unpack_b5_device(pack_b5(Q), nq)
                    Td = unpack_b5_device(pack_b5(T), nt)
                else:
                    Qd, Td = Q, T
                res, packed = _align_trace_impl(
                    Qd, Td, ql, tl, band=Wc, match=params.match,
                    mismatch=params.mismatch, gap_open=params.gap_open,
                    gap_ext=params.gap_ext)
            launches.append((Wc, chunk, res, packed))

        def build_record(args):
            i, q, qual, t, ops_row, j_end, score, packed = args
            rec = native.ops_record_normalize(q, t, ops_row, j_end,
                                              packed=packed)
            if rec is None:  # no native lib: python fallback
                if packed:
                    from ..kernels.banded import unpack_ops_packed
                    ops_row = unpack_ops_packed(ops_row)
                rec = ops_to_record(q, t, ops_row, j_end)
                rec = normalize_record(rec, q, t)
            rec = rec._replace(score=score)
            out[i] = SubreadAln(rec, np.asarray(q, dtype=np.int8),
                                np.asarray(qual, dtype=np.int8))

        # host record building: the C path releases the GIL, so a small
        # thread pool overlaps records across cores while later launches
        # still run on the device
        from concurrent.futures import ThreadPoolExecutor

        from ..utils import prof
        leftovers = []           # python-fallback work items
        rewalk: list[int] = []   # truncated walks (pathological paths)
        escalate: list[int] = []  # fast-band paths that touched the edge
        # materialize + build records PER LAUNCH: the GIL-released C
        # record build of launch k overlaps the device computing launch
        # k+1 (launches were all dispatched above), so record time hides
        # inside device time instead of extending the align stage
        for li, (Wc, chunk, res, packed) in enumerate(launches):
            scores, j_ends, _j_starts, i_rem, ops, edge = res
            with prof.current.stage("align_wait"):
                scores = np.asarray(scores)
                j_ends = np.asarray(j_ends)
                i_rem = np.asarray(i_rem)
                edge = np.asarray(edge)
                ops = np.asarray(ops)  # (P, ~nq/5) uint8 — small transfer
            fast = Wc < params.band
            work = []
            for r, i in enumerate(chunk):
                if i_rem[r] > 0:
                    rewalk.append(i)
                    continue
                if fast and edge[r]:
                    # fast-band path touched band-local column 0/W-1:
                    # realign at the full band (spec escalation rule)
                    escalate.append(i)
                    continue
                pr = pairs[i]
                q, qual, t = pr[0], pr[1], pr[2]
                work.append((i, q, qual, t, ops[r], int(j_ends[r]),
                             int(scores[r]), packed))
            if not work:
                continue
            with prof.current.stage("align_host_records"):
                recs = None
                if native.available():
                    # one GIL-released C call per launch builds +
                    # normalizes its records; ``phase`` gives each
                    # launch its own arena generation so all of a
                    # group's records stay alive together
                    L = max(len(w[4]) for w in work)
                    opsmat = np.zeros((len(work), L), dtype=np.uint8)
                    for k, w in enumerate(work):
                        opsmat[k, :len(w[4])] = w[4]
                    recs = native.ops_records_batch(
                        [w[1] for w in work], [w[3] for w in work],
                        opsmat, [w[5] for w in work], packed=packed,
                        phase=li + phase_base)
                if recs is not None:
                    for (i, q, qual, t, _o, _j, score, _p), rec in \
                            zip(work, recs):
                        out[i] = SubreadAln(
                            rec._replace(score=score),
                            np.asarray(q, dtype=np.int8),
                            np.asarray(qual, dtype=np.int8))
                else:
                    leftovers.extend(work)
        if leftovers:
            with prof.current.stage("align_host_records"):
                if len(leftovers) > 64 and native.available():
                    with ThreadPoolExecutor(max_workers=4) as ex:
                        list(ex.map(build_record, leftovers))
                else:
                    for w in leftovers:
                        build_record(w)
        if escalate:
            # identical escalation to serial_align_many: realign at the
            # full band on the host (the C aligner is bit-identical to a
            # full-band device launch).  align_band_escalated counts it.
            prof.current.count("align_band_escalated", len(escalate))
            from ..consensus.engine import serial_align_many
            res = serial_align_many(
                [pairs[i][:3] for i in escalate], params)
            for i, r in zip(escalate, res):
                out[i] = r
        if rewalk:
            # pathological paths or cached-walk budget misses: host realign.
            # Watch align_rewalk in c3poa_stats.json — a spike means the
            # walk_ops_cached shrink budget is too tight for the data.
            prof.current.count("align_rewalk", len(rewalk))
            from ..consensus.engine import serial_align_many
            res = serial_align_many([pairs[i] for i in rewalk], params)
            for i, r in zip(rewalk, res):
                out[i] = r
        return out
