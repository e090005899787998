"""Backend parity: the TPU (kernel) backend must reproduce the numpy
backend's pipeline output bit-for-bit (same profiles, peaks, alignments,
votes -> same FASTA/FASTQ bytes)."""

import os

import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.pipeline.backend import NumpyBackend
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
from c3poa_tpu.pipeline.tpu_backend import TpuBackend


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("bp")
    reads, splints = sim.make_dataset(
        n_reads=8, seed=21, insert_len=(600, 800), copies=(2, 5), error=0.05)
    sim.write_fastq(str(d / "reads.fastq"), reads)
    sim.write_fasta(str(d / "splint.fasta"), splints)
    return d, reads, splints


def run_with(backend, d, tag):
    out = str(d / f"out_{tag}")
    stats = run_pipeline(str(d / "reads.fastq"), str(d / "splint.fasta"),
                         out, PipelineConfig(), backend)
    return out, stats


def test_backend_parity(dataset):
    d, reads, splints = dataset
    out_np, stats_np = run_with(NumpyBackend(), d, "numpy")
    out_tpu, stats_tpu = run_with(TpuBackend(), d, "tpu")

    assert stats_np.consensus_written == stats_tpu.consensus_written
    assert stats_np.no_splint == stats_tpu.no_splint

    for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(out_np, "Splint1", fname)).read()
        b = open(os.path.join(out_tpu, "Splint1", fname)).read()
        assert a == b, f"{fname} differs between backends"
    log_a = open(os.path.join(out_np, "c3poa.log")).read()
    log_b = open(os.path.join(out_tpu, "c3poa.log")).read()
    assert log_a == log_b


def test_backend_parity_pipelined_groups(dataset):
    """Many small groups force the deep pipeline (group g+1's device side
    on the worker thread overlapping group g's votes, with record-arena
    double buffering) — output must stay byte-identical to numpy."""
    d, reads, splints = dataset
    cfg = PipelineConfig(group_size=2)
    out_np = str(d / "out_np_g2")
    out_tpu = str(d / "out_tpu_g2")
    s_np = run_pipeline(str(d / "reads.fastq"), str(d / "splint.fasta"),
                        out_np, cfg, NumpyBackend())
    s_tpu = run_pipeline(str(d / "reads.fastq"), str(d / "splint.fasta"),
                         out_tpu, cfg, TpuBackend())
    assert s_np.consensus_written == s_tpu.consensus_written
    for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(out_np, "Splint1", fname)).read()
        b = open(os.path.join(out_tpu, "Splint1", fname)).read()
        assert a == b, f"{fname} differs between backends (pipelined)"


def test_zero_heavy_parity_batched_splice(tmp_path):
    """A zero-repeat-heavy input (50% single-peak reads): the splice's
    overlap alignments ride the batched device align path (one z launch
    per group on the prepare thread, VERDICT r3 item 5) and the output
    stays byte-identical to the numpy backend and to the single-call
    zero_repeat_consensus semantics."""
    import json

    rng = np.random.default_rng(31)
    splint = sim.random_seq(rng, 200)
    reads = []
    for i in range(12):
        reads.append(sim.make_read(
            rng, name=f"z{i}", splint=splint,
            insert_len=int(rng.integers(900, 1400)),
            # half single-peak (zero-repeat splice), half normal
            n_copies=0 if i % 2 == 0 else 3,
            error=0.04, frag_frac=(0.8, 0.8)))
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), {"Splint1": splint})
    args = (str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"))
    cfg = PipelineConfig(group_size=4)

    out_np = str(tmp_path / "np")
    out_tpu = str(tmp_path / "tpu")
    s_np = run_pipeline(*args, out_np, cfg, NumpyBackend())
    s_tpu = run_pipeline(*args, out_tpu, cfg, TpuBackend())
    assert s_np.consensus_written == s_tpu.consensus_written > 0

    for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(out_np, "Splint1", fname)).read()
        b = open(os.path.join(out_tpu, "Splint1", fname)).read()
        assert a == b, f"{fname} differs between backends (zero-heavy)"

    # the splice ran inside the batched align stage on the prepare side
    sp = json.load(open(os.path.join(out_tpu, "c3poa_stats.json")))
    assert "zero_prep" in sp.get("stages_s", {})

    # unit-level: _prepare_group hands finalize PRE-ALIGNED z overlaps
    # (device-batched), so the finalize-side serial fallback never runs
    # for common-band pairs
    from c3poa_tpu.io.fastx import read_fastx
    from c3poa_tpu.pipeline.run import _prepare_group
    from c3poa_tpu.utils.seqs import encode, revcomp_encoded
    from c3poa_tpu.pipeline.backend import Combo
    codes = encode(splint)
    combos = [Combo("Splint1", "+", codes, len(codes)),
              Combo("Splint1", "-", revcomp_encoded(codes), len(codes))]
    group = [r for r in read_fastx(str(tmp_path / "r.fastq"))]
    prep = _prepare_group(group, combos, cfg, TpuBackend())
    from c3poa_tpu import native
    native.release_arena_slot(prep["arena_slot"], prep["arena_lease"])
    assert prep["zero_jobs"], "expected single-peak reads in the group"
    batched = [a for st, a in zip(prep["z_states"], prep["z_alns"])
               if st is not None and st["band"] == cfg.cons.band]
    assert batched and all(a is not None for a in batched)


def test_overlong_read_host_fallback():
    """Reads past the last locate bucket (131072) take the exact host
    path with no truncation: identical LocateResult to NumpyBackend,
    counted in overlong_reads_host_located (PARITY.md §10)."""
    from c3poa_tpu.pipeline.backend import Combo
    from c3poa_tpu.utils import prof
    from c3poa_tpu.utils.seqs import encode, revcomp_encoded

    rng = np.random.default_rng(5)
    splint = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 48)])
    codes = encode(splint)
    combos = [Combo("S", "+", codes, len(codes)),
              Combo("S", "-", revcomp_encoded(codes), len(codes))]
    # one overlong read (135k) with two planted splints + one normal read
    long_read = rng.integers(0, 4, 135000).astype(np.int8)
    for pos in (40000, 90000):
        long_read[pos:pos + len(codes)] = codes
    short_read = rng.integers(0, 4, 4000).astype(np.int8)
    short_read[1800:1800 + len(codes)] = codes
    reads = [long_read, short_read]

    profiler = prof.reset()
    got = TpuBackend().locate_many(reads, combos, 500)
    want = NumpyBackend().locate_many(reads, combos, 500)
    assert profiler.counts.get("overlong_reads_host_located") == 1
    for g, w in zip(got, want):
        assert g.combo == w.combo and g.score == w.score
        np.testing.assert_array_equal(g.peaks, w.peaks)
    # the planted splints in the overlong read are found, including the
    # one past any truncation a 131072 cap would have caused
    for pos in (40000, 90000):
        assert np.any(np.abs(got[0].peaks - pos) <= len(codes)), \
            (pos, got[0].peaks)


def test_packed_upload_locate_parity(dataset, monkeypatch):
    """C3POA_PACK_UPLOAD=1 (base-5 packed host->device read upload,
    unpacked on device) must leave locate results bit-identical — the
    precondition for defaulting it on where transfers are the locate
    stage's cost (tools/locate_breakdown.py)."""
    d, reads, splints = dataset
    from c3poa_tpu.pipeline.backend import Combo
    from c3poa_tpu.utils.seqs import encode, revcomp_encoded

    (sname, sseq), = splints.items()
    scodes = encode(sseq)
    combos = [Combo(sname, "+", scodes, len(scodes)),
              Combo(sname, "-", revcomp_encoded(scodes), len(scodes))]
    codes = [encode(r.seq) for r in reads]

    monkeypatch.setenv("C3POA_PACK_UPLOAD", "0")
    plain = TpuBackend().locate_many(codes, combos, 500)
    monkeypatch.setenv("C3POA_PACK_UPLOAD", "1")
    packed = TpuBackend().locate_many(codes, combos, 500)
    for a, b in zip(plain, packed):
        assert a.combo == b.combo and a.score == b.score
        np.testing.assert_array_equal(a.peaks, b.peaks)


def test_packed_upload_align_parity(dataset, monkeypatch):
    """C3POA_PACK_ALIGN=1 (base-5 packed align uploads, device unpack)
    must leave the full pipeline output byte-identical."""
    d, reads, splints = dataset
    cfg = PipelineConfig(group_size=4)
    monkeypatch.setenv("C3POA_PACK_ALIGN", "0")
    out_plain = str(d / "out_alplain")
    run_pipeline(str(d / "reads.fastq"), str(d / "splint.fasta"),
                 out_plain, cfg, TpuBackend())
    monkeypatch.setenv("C3POA_PACK_ALIGN", "1")
    out_packed = str(d / "out_alpacked")
    run_pipeline(str(d / "reads.fastq"), str(d / "splint.fasta"),
                 out_packed, cfg, TpuBackend())
    for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(out_plain, "Splint1", fname)).read()
        b = open(os.path.join(out_packed, "Splint1", fname)).read()
        assert a == b, f"{fname} differs with packed align uploads"
