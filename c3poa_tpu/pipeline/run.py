"""Single-host pipeline orchestration.

Mirrors the reference driver (C3POa.py:175-272) with TPU-first structure:
instead of a process pool scattering per-read work over temp directories
(C3POa.py:236-257) and glob-order cat gathers (C3POa.py:259-272), reads
stream in groups through batched backend calls and outputs are written in
input order (deterministic — a documented improvement over the reference's
glob-nondeterministic record order).

Output grammar parity:
- per-splint directories under out_path (C3POa.py:209-211)
- ``R2C2_Consensus.fasta`` records ``>name_avgQual_rawLen_repeats_consLen``
  with avg qual = round(mean phred, 2) (C3POa.py:167-173)
- ``R2C2_Subreads.fastq`` naming: core subreads ``name_1..name_r``; dangling
  head ``name_0``, dangling tail ``name_{r+1}``
  (bin/determine_consensus.py:57-76); zero-repeat fragments ``name_0``,
  ``name_1`` written even when the splice fails
  (bin/determine_consensus.py:106-114)
- ``c3poa.log`` stat lines (C3POa.py:214-228)
- optional gzip of both outputs (C3POa.py:86-99, --compress_output)

Documented deviations from reference quirks (SURVEY.md §3.5): failed
zero-repeat splices drop the read cleanly instead of crashing/duplicating
subreads; with ``-z`` (exclude zero repeats) single-peak reads are dropped
without writes.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from ..consensus.engine import (
    ConsensusJob, ConsensusParams, consensus_align, consensus_build_pairs,
    consensus_finalize, zero_finalize, zero_params, zero_prepare,
)
from ..io.fastx import read_fastx
from ..utils import prof
from ..utils.mem import RssRestartNeeded, rss_mb
from ..utils.progress import Progress
from ..utils.seqs import decode, encode, phred_to_array, revcomp_encoded
from .backend import Combo, NumpyBackend
from .segment import segment_read

VERSION = "v2.2.3+tpu"
MANIFEST = ".c3poa_progress.json"


@dataclasses.dataclass
class PipelineConfig:
    lencutoff: int = 1000          # -l (C3POa.py:42)
    mdistcutoff: int = 500         # -d (C3POa.py:45); also peak min distance
    zero: bool = True              # --zero inverted flag (C3POa.py:48)
    group_size: int = 1000         # -g
    num_threads: int = 1           # -n (used by CPU-parallel path)
    compress: bool = False         # -co
    resume: bool = False           # continue an interrupted run (the
                                   # reference's PSL cache role,
                                   # bin/preprocess.py:17)
    splint_min_score: int = 50     # no-splint analogue of BLAT matches>50
                                   # (bin/preprocess.py:32)
    # multi-host sharding (parallel/dist.py): host h processes read groups
    # g with g % process_count == h and writes under out/host_<h>/
    process_index: int = 0
    process_count: int = 1
    # >0: raise RssRestartNeeded after a group checkpoint once VmRSS
    # exceeds this many MB (progress guaranteed: only checks after at
    # least one NEW group completed).  Used by the CLI's --rss-restart-mb
    # supervisor to bound memory on hosts whose accelerator client leaks
    # every host->device transfer (this box's relayed TPU runtime does —
    # tools/leak_probe.py; framework buffers themselves are bounded).
    rss_restart_mb: int = 0
    cons: ConsensusParams = dataclasses.field(default_factory=ConsensusParams)

    def resume_key(self, reads_path, splint_path) -> dict:
        return {
            "reads": os.path.abspath(reads_path),
            "splint": os.path.abspath(splint_path),
            "lencutoff": self.lencutoff, "mdistcutoff": self.mdistcutoff,
            "zero": self.zero, "group_size": self.group_size,
            "compress": self.compress,
            "process": [self.process_index, self.process_count],
        }


@dataclasses.dataclass
class PipelineStats:
    total_reads: int = 0       # reads passing the length filter
    short_reads: int = 0
    no_splint: int = 0
    consensus_written: int = 0

    @property
    def all_reads(self):
        return self.total_reads + self.short_reads


class _SplintWriters:
    """Lazy per-splint output files, gzip-aware, resume-capable."""

    def __init__(self, out_path: str, compress: bool,
                 restore_sizes: dict | None = None):
        self.out_path = out_path
        self.compress = compress
        self.restore_sizes = restore_sizes or {}
        self._handles: dict[str, tuple] = {}

    def _open(self, path: str, rel: str):
        if rel in self.restore_sizes and os.path.exists(path):
            # resume: truncate to the last checkpointed size, then append
            with open(path, "r+b") as fh:
                fh.truncate(self.restore_sizes[rel])
            return open(path, "a")
        return open(path, "w")

    def get(self, splint: str):
        if splint not in self._handles:
            d = os.path.join(self.out_path, splint)
            os.makedirs(d, exist_ok=True)
            if self.compress:
                cons = gzip.open(
                    os.path.join(d, "R2C2_Consensus.fasta.gz"), "wt")
                subs = gzip.open(
                    os.path.join(d, "R2C2_Subreads.fastq.gz"), "wt")
            else:
                cons = self._open(os.path.join(d, "R2C2_Consensus.fasta"),
                                  f"{splint}/R2C2_Consensus.fasta")
                subs = self._open(os.path.join(d, "R2C2_Subreads.fastq"),
                                  f"{splint}/R2C2_Subreads.fastq")
            self._handles[splint] = (cons, subs)
        return self._handles[splint]

    def sizes(self) -> dict:
        # start from the restored snapshot: splints valid from a previous
        # session but untouched in THIS one must stay in the manifest, or
        # a third session would open their files in 'w' mode and truncate
        # every earlier record
        out = dict(self.restore_sizes)
        for splint, (cons, subs) in self._handles.items():
            cons.flush()
            subs.flush()
            out[f"{splint}/R2C2_Consensus.fasta"] = cons.tell()
            out[f"{splint}/R2C2_Subreads.fastq"] = subs.tell()
        return out

    def close(self):
        for cons, subs in self._handles.values():
            cons.close()
            subs.close()


def _read_groups(path: str, lencutoff: int, group_size: int,
                 stats: "PipelineStats") -> Iterator[list]:
    """Yields read groups; counts length-filtered reads into stats
    (mirrors the streaming group assembly of C3POa.py:238-254)."""
    group: list = []
    for rec in read_fastx(path):
        if len(rec.seq) < lencutoff:
            stats.short_reads += 1
            continue
        group.append(rec)
        if len(group) == group_size:
            yield group
            group = []
    if group:
        yield group


class _GroupStream:
    """Group streaming with seek-resume for plain FASTQ inputs.

    Iterating yields 1-based ``(gi, group)``.  For uncompressed FASTQ
    the stream records, per group, the byte offset after its last read
    and the short-read count at that moment; ``checkpoint_fields(gi)``
    hands those to the resume manifest so the NEXT session seeks
    straight to group gi+1 instead of re-parsing gigabytes of completed
    input (the dominant restart cost measured in the 1M-read soak's
    --rss-restart-mb run, BENCHMARKS.md).  Gzip/FASTA inputs fall back
    to full re-streaming with count-based skipping, byte-identically.
    """

    def __init__(self, path: str, cfg: "PipelineConfig",
                 filter_stats: "PipelineStats", skip_groups: int,
                 manifest: dict | None):
        from ..io.fastx import is_plain_fastq
        self.path = path
        self.cfg = cfg
        self.filter_stats = filter_stats
        self.skip_groups = skip_groups
        self._marks: dict = {}   # gi -> (offset_after, short_reads_seen)
        self.seekable = is_plain_fastq(path)
        self._start_offset = 0
        self._start_gi = 0
        if (self.seekable and skip_groups and manifest
                and manifest.get("next_offset") is not None):
            self._start_offset = manifest["next_offset"]
            self._start_gi = skip_groups
            filter_stats.short_reads = manifest.get("short_reads_seen", 0)

    def __iter__(self):
        gi = self._start_gi
        if not self.seekable:
            for group in _read_groups(self.path, self.cfg.lencutoff,
                                      self.cfg.group_size,
                                      self.filter_stats):
                gi += 1
                yield gi, group
            return
        from ..io.fastx import read_fastq_offsets
        group: list = []
        for rec, off in read_fastq_offsets(self.path, self._start_offset):
            if len(rec.seq) < self.cfg.lencutoff:
                self.filter_stats.short_reads += 1
                continue
            group.append(rec)
            if len(group) == self.cfg.group_size:
                gi += 1
                self._marks[gi] = (off, self.filter_stats.short_reads)
                yield gi, group
                group = []
        if group:
            gi += 1
            self._marks[gi] = (None, self.filter_stats.short_reads)
            yield gi, group

    def checkpoint_fields(self, gi: int) -> dict:
        """Manifest fields for a checkpoint at group ``gi`` (pruning
        older marks; the final partial group stores no offset — there is
        nothing after it to resume to)."""
        mark = self._marks.get(gi)
        for k in [k for k in self._marks if k <= gi]:
            del self._marks[k]
        if mark is None or mark[0] is None:
            return {}
        return {"next_offset": mark[0], "short_reads_seen": mark[1]}


def _format_qual(q: np.ndarray) -> str:
    return (np.clip(q.astype(np.int16), 0, 93) + 33).astype(np.uint8) \
        .tobytes().decode("ascii")


class _MemoryWriters:
    """Writer-compatible collector used by multiprocessing workers: output
    text is returned to the parent, which writes in group order."""

    def __init__(self):
        self._h: dict = {}

    def get(self, splint: str):
        if splint not in self._h:
            import io
            self._h[splint] = (io.StringIO(), io.StringIO())
        return self._h[splint]

    def blobs(self) -> dict:
        return {s: (c.getvalue(), u.getvalue())
                for s, (c, u) in self._h.items()}


def _group_worker(payload):
    """Runs in a worker process (numpy backend only — no jax import)."""
    gi, group, combos, cfg = payload
    stats = PipelineStats()
    stats.total_reads = len(group)
    writers = _MemoryWriters()
    _process_group(group, combos, cfg, NumpyBackend(), writers, stats)
    return gi, writers.blobs(), dataclasses.asdict(stats)


def _load_manifest(out_path: str, key: dict):
    path = os.path.join(out_path, MANIFEST)
    if not os.path.exists(path):
        return None
    try:
        m = json.load(open(path))
    except (OSError, ValueError):
        return None
    return m if m.get("key") == key else None


def run_pipeline(reads_path: str, splint_path: str, out_path: str,
                 cfg: PipelineConfig | None = None, backend=None
                 ) -> PipelineStats:
    cfg = cfg or PipelineConfig()
    backend = backend or NumpyBackend()

    # multi-host: this host works under out/host_<h>/ on its round-robin
    # share of the groups; host trees are written plain and compressed (if
    # requested) at merge time, where byte spans interleave by group index
    multihost = cfg.process_count > 1
    root_out = out_path
    final_compress = cfg.compress
    if multihost:
        out_path = os.path.join(out_path, f"host_{cfg.process_index}")
        cfg = dataclasses.replace(cfg, compress=False)

    os.makedirs(out_path, exist_ok=True)
    profiler = prof.reset()

    combos: list[Combo] = []
    for rec in read_fastx(splint_path):
        codes = encode(rec.seq)
        combos.append(Combo(rec.name, "+", codes, len(codes)))
        combos.append(Combo(rec.name, "-", revcomp_encoded(codes), len(codes)))
    if not combos:
        raise ValueError(f"no splints in {splint_path}")

    stats = PipelineStats()
    key = cfg.resume_key(reads_path, splint_path)
    skip_groups = 0
    restore_sizes = None
    manifest = None
    span_groups: list = []   # multihost: per-group cumulative file sizes
    if cfg.resume and not cfg.compress:
        manifest = _load_manifest(out_path, key)
        if manifest:
            skip_groups = manifest["groups_done"]
            restore_sizes = manifest["files"]
            span_groups = manifest.get("span_groups", [])
            for f, v in manifest["stats"].items():
                setattr(stats, f, v)

    writers = _SplintWriters(out_path, cfg.compress, restore_sizes)
    manifest_path = os.path.join(out_path, MANIFEST)
    overlap = getattr(backend, "supports_overlap", False)
    # CPU path: parallelize whole groups over processes (the reference's
    # mp.Pool role, C3POa.py:236-257) with in-order writes
    use_mp = (not overlap) and cfg.num_threads > 1
    executor = ThreadPoolExecutor(max_workers=1) if overlap else None

    def mine(gi):
        """Does this host own 1-based group gi?"""
        return (gi - 1) % cfg.process_count == cfg.process_index

    def checkpoint(gi):
        if not cfg.compress:
            sizes = writers.sizes()
            if multihost:
                span_groups.append({"gi": gi, "sizes": sizes})
            with open(manifest_path, "w") as fh:
                json.dump({"key": key, "groups_done": gi,
                           "files": sizes,
                           "stats": dataclasses.asdict(stats),
                           "span_groups": span_groups,
                           **stream.checkpoint_fields(gi)}, fh)
            if (cfg.rss_restart_mb and gi > skip_groups
                    and rss_mb() > cfg.rss_restart_mb):
                # the manifest for gi is durable; a fresh process resumes
                # byte-identically from here (same state the SIGKILL
                # chaos test exercises, but with a clean shutdown)
                raise RssRestartNeeded(
                    f"RSS {rss_mb()} MB > {cfg.rss_restart_mb} MB after "
                    f"group {gi}; exiting for a clean --resume restart")

    progress = Progress("c3poa")

    def finish(gi, group, prelocated):
        stats.total_reads += len(group)
        profiler.count("reads", len(group))
        _process_group(group, combos, cfg, backend, writers, stats,
                       prelocated)
        stats.short_reads = filter_stats.short_reads
        progress.update(len(group))
        checkpoint(gi)

    def finish_prep(gi, prep):
        group = prep["group"]
        stats.total_reads += len(group)
        profiler.count("reads", len(group))
        _finalize_group(prep, cfg, writers, stats)
        stats.short_reads = filter_stats.short_reads
        progress.update(len(group))
        checkpoint(gi)

    # deep pipelining: a locate thread runs group g+2's locate while an
    # align thread runs group g+1's segment + round-1 align + record
    # building and this thread votes/writes group g — three stages in
    # flight, so the device queue stays fed through the host-side
    # phases.  Needs the single-round engine (a second round would align
    # from the finalize side and race the align thread's record arenas);
    # finalize of this host's k-th group always completes before its
    # (k+2)-th prep starts, so the two record-arena generations
    # (slot = k % 2, counted over OWNED groups — gi % 2 would collide
    # under multihost round-robin with an even process_count) never
    # overlap.
    deep = overlap and cfg.cons.rounds == 1
    loc_executor = ThreadPoolExecutor(max_workers=1) if deep else None

    # filter_stats counts short reads while streaming; on a seek-resume
    # the skipped prefix's count is restored from the manifest instead
    # of re-parsing the file (see _GroupStream)
    filter_stats = PipelineStats()
    stream = _GroupStream(reads_path, cfg, filter_stats, skip_groups,
                          manifest)
    try:
        if use_mp:
            _run_groups_mp(stream, combos, cfg, writers, stats,
                           filter_stats, skip_groups, mine, checkpoint,
                           profiler, progress)
        elif deep:
            from collections import deque
            owned = 0  # this host's processed-group counter (arena slot)
            prepped: deque = deque()  # (gi, prep future), depth <= 2
            for gi, group in stream:
                if gi <= skip_groups or not mine(gi):
                    continue
                owned += 1
                # locate thread carries ALL host prep (locate + segment +
                # pair building + zero overlap find); the align thread
                # holds only device launches + record builds.
                # C3POA_DEEP_SPLIT=0 restores the round-3 placement
                # (host prep on the align thread) for interleaved A/Bs.
                split = os.environ.get("C3POA_DEEP_SPLIT", "1") == "1"
                if split:
                    fut_host = loc_executor.submit(
                        _host_prepare_group, group, combos, cfg, backend)
                else:
                    fut_host = loc_executor.submit(
                        _locate_group, group, combos, cfg, backend)
                if len(prepped) == 2:
                    # finalize the oldest group BEFORE queueing the next
                    # prep: frees its record arena slot
                    pgi, pfut = prepped.popleft()
                    finish_prep(pgi, pfut.result())
                if split:
                    fut = executor.submit(
                        lambda s=owned % 2, fh=fut_host:
                            _device_prepare_group(fh.result(), cfg,
                                                  backend, s))
                else:
                    fut = executor.submit(
                        lambda g=group, s=owned % 2, fl=fut_host:
                            _prepare_group(g, combos, cfg, backend,
                                           fl.result(), s))
                prepped.append((gi, fut))
            while prepped:
                pgi, pfut = prepped.popleft()
                finish_prep(pgi, pfut.result())
        else:
            pending = None  # (gi, group, future)
            for gi, group in stream:
                if gi <= skip_groups or not mine(gi):
                    continue
                if executor is not None:
                    # group g+1's locate runs on a worker thread while
                    # group g's consensus runs on this one
                    fut = executor.submit(_locate_group, group, combos,
                                          cfg, backend)
                    if pending is not None:
                        pgi, pgroup, pfut = pending
                        finish(pgi, pgroup, pfut.result())
                    pending = (gi, group, fut)
                else:
                    finish(gi, group, None)
            if pending is not None:
                pgi, pgroup, pfut = pending
                finish(pgi, pgroup, pfut.result())
        stats.short_reads = filter_stats.short_reads
    finally:
        if executor is not None:
            executor.shutdown(wait=True)
        if loc_executor is not None:
            loc_executor.shutdown(wait=True)
        # executors are drained: no prep/finalize can be in flight, so any
        # lease still open belongs to a group abandoned by an exception
        # (e.g. RssRestartNeeded with preps queued) — clear them so an
        # in-process retry/resume doesn't hit ArenaSlotCollision
        from .. import native
        native.reset_arena_leases()
        progress.close()
        writers.close()

    _write_log(out_path, stats)
    profiler.dump(os.path.join(out_path, "c3poa_stats.json"))

    if multihost:
        from ..parallel import dist

        # every host streams the whole fastq, so each counts ALL short
        # reads — only host 0 contributes them to the global sum
        contrib = dataclasses.asdict(stats)
        if cfg.process_index != 0:
            contrib["short_reads"] = 0
        # the collective is also the completion barrier: when it returns,
        # every host has closed its output files
        totals = dist.allreduce_stats(contrib)
        gstats = PipelineStats(**totals)
        if cfg.process_index == 0:
            dist.merge_host_outputs(root_out, cfg.process_count,
                                    compress=final_compress)
            _write_log(root_out, gstats)
        return gstats
    return stats


def _run_groups_mp(stream, combos, cfg, writers, stats, filter_stats,
                   skip_groups, mine, checkpoint, profiler, progress):
    """CPU multiprocessing: whole read groups fan out to worker processes
    (spawn, like the reference C3POa.py:279); the parent writes returned
    blobs in group order, keeping deterministic output.

    Failures are LOUD (utils/procpool.imap_strict): a worker exception
    re-raises here naming the group, and an abruptly-dead worker
    (SIGKILL/OOM) raises WorkerDied instead of hanging or silently
    dropping the group — the reference's silent-loss bug
    (C3POa.py:245-248) explicitly improved on."""
    from ..utils.procpool import imap_strict

    def payloads():
        for gi, group in stream:
            if gi <= skip_groups or not mine(gi):
                continue
            yield gi, group, combos, cfg

    for gi, blobs, wstats in imap_strict(_group_worker, payloads(),
                                         cfg.num_threads,
                                         label=lambda pl: pl[0]):
        for splint, (cons_txt, subs_txt) in blobs.items():
            cons_fh, subs_fh = writers.get(splint)
            cons_fh.write(cons_txt)
            subs_fh.write(subs_txt)
        stats.total_reads += wstats["total_reads"]
        stats.no_splint += wstats["no_splint"]
        stats.consensus_written += wstats["consensus_written"]
        profiler.count("reads", wstats["total_reads"])
        stats.short_reads = filter_stats.short_reads
        progress.update(wstats["total_reads"])
        checkpoint(gi)


def _locate_group(group, combos, cfg: PipelineConfig, backend):
    """Encode + locate (the part overlapped with the previous group's
    consensus when the backend supports it)."""
    enc = [encode(r.seq) for r in group]
    quals = [phred_to_array(r.qual) if r.qual is not None
             else np.full(len(r.seq), 30, dtype=np.int8) for r in group]
    with prof.current.stage("locate"):
        located = backend.locate_many(enc, combos, cfg.mdistcutoff)
    return enc, quals, located


def _host_prepare_group(group, combos, cfg: PipelineConfig, backend,
                        prelocated=None) -> dict:
    """Host-only preparation: locate + segmentation + consensus pair
    building + zero-repeat overlap finding.  In the deep pipeline this
    runs on the LOCATE thread so the align thread carries only device
    launches + GIL-released record builds (the measured align-thread
    chain was the critical path, BENCHMARKS.md stage profile)."""
    if prelocated is None:
        prelocated = _locate_group(group, combos, cfg, backend)
    enc, quals, located = prelocated

    jobs: list[ConsensusJob] = []
    job_meta: list = []       # (record idx, splint, seg)
    zero_jobs: list = []      # (record idx, splint, bounds)
    no_splint = 0

    _t_seg = prof.current.stage("segment")
    _t_seg.__enter__()
    for ri, (rec, codes, qual, loc) in enumerate(
            zip(group, enc, quals, located)):
        if loc.score < cfg.splint_min_score:
            no_splint += 1
            continue
        combo = combos[loc.combo]
        seg = segment_read(len(codes), loc.peaks, combo.splint_len)
        if seg is None:
            continue
        # the reference routes ANY read with zero surviving subreads and
        # exactly two dangling fragments through the zero-repeat splice
        # (bin/determine_consensus.py:14-16) — including multi-peak reads
        # whose subreads all failed the median-length filter
        if seg.zero_repeat or (not seg.subread_bounds and
                               len(seg.dangling_bounds) == 2):
            if cfg.zero:
                zero_jobs.append((ri, combo.splint_name, seg.dangling_bounds))
            continue
        if not seg.subread_bounds:
            continue  # no usable subreads and <2 danglings: dropped
        subs = [codes[a:b] for a, b in seg.subread_bounds]
        sq = [qual[a:b] for a, b in seg.subread_bounds]
        dang = [codes[a:b] for a, b in seg.dangling_bounds]
        dq = [qual[a:b] for a, b in seg.dangling_bounds]
        jobs.append(ConsensusJob(subs, sq, dang, dq))
        job_meta.append((ri, combo.splint_name, seg))
    _t_seg.__exit__(None, None, None)

    with prof.current.stage("consensus"):
        state0 = consensus_build_pairs(jobs, cfg.cons)

    # zero-repeat splices: overlap-find here; the common-band overlap
    # pairs are device-aligned in _device_prepare_group (one extra
    # launch per group, its own arena phase) — the reference treats the
    # splice as first-class (--zero default-on,
    # bin/determine_consensus.py:106-136), so on splice-heavy data it
    # must not run as an unbatched serial host stage inside finalize
    # (VERDICT r3 item 5)
    z_states: list = []
    if zero_jobs:
        with prof.current.stage("zero_prep"):
            for ri, _splint, bounds in zero_jobs:
                codes, qual = enc[ri], quals[ri]
                (a0, b0), (a1, b1) = bounds
                z_states.append(zero_prepare(
                    codes[a0:b0], qual[a0:b0], codes[a1:b1], qual[a1:b1],
                    cfg.cons))
    return {"group": group, "enc": enc, "quals": quals, "jobs": jobs,
            "job_meta": job_meta, "zero_jobs": zero_jobs,
            "z_states": z_states, "no_splint": no_splint,
            "state0": state0}


def _device_prepare_group(hprep: dict, cfg: PipelineConfig, backend,
                          arena_slot: int = 0) -> dict:
    """Device half: claim the record-arena generation, run the batched
    round-1 alignment and the zero-overlap batch.  Runs on the
    pipeline's align thread so group g+1's device work overlaps group
    g's host votes/writes; ``arena_slot`` double-buffers the native
    record arenas across the two in-flight groups."""
    from .. import native
    arena_lease = native.claim_arena_slot(arena_slot)
    native.set_arena_slot(arena_slot)
    with prof.current.stage("consensus"):
        state = consensus_align(hprep["state0"], backend.align_many)

    z_states = hprep["z_states"]
    z_alns = [None] * len(z_states)
    dev = [zi for zi, st in enumerate(z_states)
           if st is not None and st["band"] == cfg.cons.band]
    if dev:
        zp = zero_params(cfg.cons, cfg.cons.band)
        alns = backend.align_many(
            [z_states[zi]["pair"] for zi in dev], zp, phase_base=16)
        for zi, a in zip(dev, alns):
            z_alns[zi] = a
    prep = dict(hprep)
    prep.pop("state0")
    prep.update(state=state, z_alns=z_alns,
                arena_slot=arena_slot, arena_lease=arena_lease)
    return prep


def _prepare_group(group, combos, cfg: PipelineConfig, backend,
                   prelocated=None, arena_slot: int = 0) -> dict:
    """Single-call preparation (host + device halves)."""
    hprep = _host_prepare_group(group, combos, cfg, backend, prelocated)
    return _device_prepare_group(hprep, cfg, backend, arena_slot)


def _process_group(group, combos, cfg: PipelineConfig, backend, writers,
                   stats: PipelineStats, prelocated=None) -> None:
    prep = _prepare_group(group, combos, cfg, backend, prelocated)
    _finalize_group(prep, cfg, writers, stats)


def _finalize_group(prep: dict, cfg: PipelineConfig, writers,
                    stats: PipelineStats) -> None:
    stats.no_splint += prep["no_splint"]
    try:
        _finalize_group_inner(prep, cfg, writers, stats)
    finally:
        # release even when a vote/write step raises, so an in-process
        # retry (e.g. the RssRestartNeeded resume pattern) can claim
        # the slot again instead of hitting ArenaSlotCollision
        from .. import native
        native.release_arena_slot(prep["arena_slot"], prep["arena_lease"])


def _finalize_group_inner(prep: dict, cfg: PipelineConfig, writers,
                          stats: PipelineStats) -> None:
    group = prep["group"]
    enc, quals = prep["enc"], prep["quals"]
    jobs, job_meta = prep["jobs"], prep["job_meta"]
    zero_jobs = prep["zero_jobs"]

    with prof.current.stage("consensus"):
        results = consensus_finalize(prep["state"])

    emitted = []  # (record idx, splint, repeats, cons_codes, seg-like)
    for (ri, splint, seg), job, (cons, _cq) in zip(job_meta, jobs, results):
        emitted.append((ri, splint, len(job.subreads), cons, seg, job))

    z_states = prep.get("z_states") or [None] * len(zero_jobs)
    z_alns = prep.get("z_alns") or [None] * len(zero_jobs)
    for (ri, splint, bounds), st, aln in zip(zero_jobs, z_states, z_alns):
        codes, qual = enc[ri], quals[ri]
        (a0, b0), (a1, b1) = bounds
        with prof.current.stage("zero_repeat"):
            cons, _cq = zero_finalize(st, cfg.cons, aln)
        if len(cons) < cfg.mdistcutoff:
            cons = np.zeros(0, dtype=np.int8)
        job = ConsensusJob([], [], [codes[a0:b0], codes[a1:b1]],
                           [qual[a0:b0], qual[a1:b1]])
        seg = None
        emitted.append((ri, splint, 0, cons, seg, job))

    # write in input order; record text is built by one GIL-released C
    # call per splint/file (native.format_fastx) — per-record f-strings
    # held the GIL ~0.5 s/group under pipeline contention
    emitted.sort(key=lambda e: e[0])
    _t_wr = prof.current.stage("write")
    _t_wr.__enter__()
    from .. import native
    use_c = native.available() and hasattr(native.get_lib(),
                                           "c3_format_fastx")
    by_splint: dict = {}  # splint -> (cons_n, cons_s, sub_n, sub_s, sub_q)
    for ri, splint, repeats, cons, seg, job in emitted:
        rec = group[ri]
        if use_c:
            cn, cs, sn, ss, sq = by_splint.setdefault(
                splint, ([], [], [], [], []))
            _collect_subreads(sn, ss, sq, rec.name, job, repeats,
                              zero=(seg is None))
        else:
            cons_fh, sub_fh = writers.get(splint)
            _write_subreads(sub_fh, rec.name, job, repeats,
                            zero=(seg is None))
        if len(cons) == 0:
            continue
        qarr = quals[ri]
        avg_qual = round(float(np.sum(qarr.astype(np.int64))) / len(qarr), 2)
        header = f"{rec.name}_{avg_qual}_{len(rec.seq)}_{repeats}_{len(cons)}"
        if use_c:
            cn.append(header)
            cs.append(cons)
        else:
            cons_fh.write(f">{header}\n{decode(cons)}\n")
        stats.consensus_written += 1
    if use_c:
        for splint, (cn, cs, sn, ss, sq) in by_splint.items():
            cons_fh, sub_fh = writers.get(splint)
            subs_txt = native.format_fastx(sn, ss, sq)
            cons_txt = native.format_fastx(cn, cs)
            if subs_txt is None or cons_txt is None:  # cap race: fallback
                for name, codes, q in zip(sn, ss, sq):
                    sub_fh.write(
                        f"@{name}\n{decode(codes)}\n+\n{_format_qual(q)}\n")
                for name, codes in zip(cn, cs):
                    cons_fh.write(f">{name}\n{decode(codes)}\n")
            else:
                sub_fh.write(subs_txt)
                cons_fh.write(cons_txt)
    _t_wr.__exit__(None, None, None)


def _collect_subreads(names: list, seqs: list, quals: list, name: str,
                      job: ConsensusJob, repeats: int, zero: bool) -> None:
    """Same record order/naming as _write_subreads, collected for the
    batched C formatter."""
    if zero:
        for i, (codes, q) in enumerate(zip(job.dangling, job.dangling_quals)):
            names.append(f"{name}_{i}")
            seqs.append(codes)
            quals.append(q)
        return
    for i, (codes, q) in enumerate(zip(job.subreads, job.sub_quals)):
        names.append(f"{name}_{i + 1}")
        seqs.append(codes)
        quals.append(q)
    for j, (codes, q) in enumerate(zip(job.dangling, job.dangling_quals)):
        names.append(f"{name}_{0 if j == 0 else repeats + 1}")
        seqs.append(codes)
        quals.append(q)


def _write_subreads(fh, name: str, job: ConsensusJob, repeats: int,
                    zero: bool) -> None:
    if zero:
        # zero-repeat fragments: name_0, name_1 (bin/determine_consensus.py:110)
        for i, (codes, q) in enumerate(zip(job.dangling, job.dangling_quals)):
            fh.write(f"@{name}_{i}\n{decode(codes)}\n+\n{_format_qual(q)}\n")
        return
    for i, (codes, q) in enumerate(zip(job.subreads, job.sub_quals)):
        fh.write(f"@{name}_{i + 1}\n{decode(codes)}\n+\n{_format_qual(q)}\n")
    for j, (codes, q) in enumerate(zip(job.dangling, job.dangling_quals)):
        idx = 0 if j == 0 else repeats + 1
        fh.write(f"@{name}_{idx}\n{decode(codes)}\n+\n{_format_qual(q)}\n")


def _write_log(out_path: str, stats: PipelineStats) -> None:
    """c3poa.log stat lines (C3POa.py:214-228)."""
    all_reads = max(stats.all_reads, 1)
    thrown = stats.short_reads + stats.no_splint
    with open(os.path.join(out_path, "c3poa.log"), "w") as fh:
        print("C3POa version:", VERSION, file=fh)
        print("Total reads:", stats.all_reads, file=fh)
        print("No splint reads:", stats.no_splint,
              "({:.2f}%)".format((stats.no_splint / all_reads) * 100), file=fh)
        print("Under len cutoff:", stats.short_reads,
              "({:.2f}%)".format((stats.short_reads / all_reads) * 100), file=fh)
        print("Total thrown away reads:", thrown,
              "({:.2f}%)".format((thrown / all_reads) * 100), file=fh)
        print("Reads after preprocessing:", stats.all_reads - thrown, file=fh)
