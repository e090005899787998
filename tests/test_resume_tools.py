import json
import os

import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.io.fastx import read_fastx
from c3poa_tpu.pipeline.run import MANIFEST, PipelineConfig, run_pipeline
from c3poa_tpu.tools.demux_nextera_tso import demultiplex


def make_inputs(d, n=8, seed=3):
    reads, splints = sim.make_dataset(
        n_reads=n, seed=seed, insert_len=(600, 900), copies=(2, 4),
        error=0.05)
    sim.write_fastq(str(d / "reads.fastq"), reads)
    sim.write_fasta(str(d / "splint.fasta"), splints)
    return reads, splints


def test_resume_reproduces_full_run(tmp_path):
    make_inputs(tmp_path)
    cfg = PipelineConfig(group_size=3)
    full = str(tmp_path / "full")
    run_pipeline(str(tmp_path / "reads.fastq"), str(tmp_path / "splint.fasta"),
                 full, cfg)

    # simulate an interrupted run: run group 1 only by truncating the input,
    # then resume with the full input
    part = str(tmp_path / "part")
    cfg_r = PipelineConfig(group_size=3, resume=True)
    run_pipeline(str(tmp_path / "reads.fastq"), str(tmp_path / "splint.fasta"),
                 part, cfg_r)
    # doctor the manifest back to groups_done=1 and truncate outputs to the
    # recorded size of the first checkpoint by re-running with a fresh
    # manifest pointing at group 1
    man = json.load(open(os.path.join(part, MANIFEST)))
    assert man["groups_done"] == 3  # 8 reads / groups of 3

    # forge an interrupted state: keep only the first group's bytes
    # (replay a fresh run with one group, then swap in the full input)
    small = str(tmp_path / "small")
    os.makedirs(small, exist_ok=True)
    first3 = list(read_fastx(str(tmp_path / "reads.fastq")))[:3]
    with open(tmp_path / "first3.fastq", "w") as fh:
        for r in first3:
            fh.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n")
    run_pipeline(str(tmp_path / "first3.fastq"),
                 str(tmp_path / "splint.fasta"), small,
                 PipelineConfig(group_size=3))
    # craft manifest for the full input claiming group 1 done
    man_small = {
        "key": PipelineConfig(group_size=3).resume_key(
            str(tmp_path / "reads.fastq"), str(tmp_path / "splint.fasta")),
        "groups_done": 1,
        "files": {
            "Splint1/R2C2_Consensus.fasta": os.path.getsize(
                os.path.join(small, "Splint1", "R2C2_Consensus.fasta")),
            "Splint1/R2C2_Subreads.fastq": os.path.getsize(
                os.path.join(small, "Splint1", "R2C2_Subreads.fastq")),
        },
        "stats": {"total_reads": 3, "short_reads": 0, "no_splint": 0,
                  "consensus_written": sum(
                      1 for _ in read_fastx(os.path.join(
                          small, "Splint1", "R2C2_Consensus.fasta")))},
    }
    resumed = str(tmp_path / "resumed")
    os.makedirs(os.path.join(resumed, "Splint1"), exist_ok=True)
    import shutil
    for f in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        shutil.copy(os.path.join(small, "Splint1", f),
                    os.path.join(resumed, "Splint1", f))
    json.dump(man_small, open(os.path.join(resumed, MANIFEST), "w"))

    stats = run_pipeline(str(tmp_path / "reads.fastq"),
                         str(tmp_path / "splint.fasta"), resumed, cfg_r)

    for f in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(full, "Splint1", f)).read()
        b = open(os.path.join(resumed, "Splint1", f)).read()
        assert a == b, f"{f} differs after resume"
    log_a = open(os.path.join(full, "c3poa.log")).read()
    log_b = open(os.path.join(resumed, "c3poa.log")).read()
    assert log_a == log_b


def test_stats_json_written(tmp_path):
    make_inputs(tmp_path, n=4)
    out = str(tmp_path / "out")
    run_pipeline(str(tmp_path / "reads.fastq"), str(tmp_path / "splint.fasta"),
                 out, PipelineConfig())
    stats = json.load(open(os.path.join(out, "c3poa_stats.json")))
    assert stats["counters"]["reads"] == 4
    assert "locate" in stats["stages_s"]
    assert "consensus" in stats["stages_s"]
    assert stats["counters"]["align_cells"] > 0
    assert stats["align_cell_updates_per_sec"] > 0


def test_demux_nextera_tso(tmp_path):
    rng = np.random.default_rng(0)
    nexts = {f"A{i}": sim.random_seq(np.random.default_rng(i), 15)
             for i in range(1, 5)}
    tsos = {f"T{i}": sim.random_seq(np.random.default_rng(100 + i), 12)
            for i in range(1, 4)}
    sim.write_fasta(str(tmp_path / "n.fasta"), nexts)
    sim.write_fasta(str(tmp_path / "t.fasta"), tsos)
    with open(tmp_path / "in.fasta", "w") as fh:
        # read with A2 + T1 indexes in the first 300bp
        seq = sim.random_seq(rng, 40) + nexts["A2"] + \
            sim.random_seq(rng, 60) + tsos["T1"] + sim.random_seq(rng, 400)
        fh.write(f">r1\n{seq}\n")
        # short read: dropped
        fh.write(f">r2\n{sim.random_seq(rng, 200)}\n")
        # no indexes: empty fields
        fh.write(f">r3\n{sim.random_seq(rng, 500)}\n")
    n_in, n_out = demultiplex(str(tmp_path / "in.fasta"), str(tmp_path),
                              str(tmp_path / "n.fasta"),
                              str(tmp_path / "t.fasta"))
    assert (n_in, n_out) == (3, 2)
    recs = list(read_fastx(str(tmp_path / "Indexed_reads.fasta")))
    names = {r.name for r in recs}
    assert "r1|A2_T1" in names
    assert any(n.startswith("r3|") and n.endswith("_") or "r3|_" in n
               for n in names)


def test_progress_reporting(tmp_path, capfd, monkeypatch):
    """C3POA_PROGRESS=1 emits periodic reads/s lines to stderr (the
    reference's tqdm role, C3POa.py:237)."""
    import numpy as np

    from c3poa_tpu import sim
    from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline

    monkeypatch.setenv("C3POA_PROGRESS", "1")
    reads, splints = sim.make_dataset(n_reads=6, seed=8,
                                      insert_len=(300, 500), copies=(2, 4))
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    run_pipeline(str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"),
                 str(tmp_path / "out"),
                 PipelineConfig(lencutoff=500, group_size=2))
    err = capfd.readouterr().err
    assert "[c3poa]" in err and "reads/s" in err


def test_resume_deep_pipeline_backend(tmp_path):
    """Resume must also be byte-exact under the 3-stage deep pipeline
    (TpuBackend): skipped groups never enter the locate/prep queues and
    checkpoints are written strictly in group order."""
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend

    make_inputs(tmp_path)
    cfg = PipelineConfig(group_size=3)
    full = str(tmp_path / "tfull")
    run_pipeline(str(tmp_path / "reads.fastq"),
                 str(tmp_path / "splint.fasta"), full, cfg, TpuBackend())

    small = str(tmp_path / "tsmall")
    first3 = list(read_fastx(str(tmp_path / "reads.fastq")))[:3]
    with open(tmp_path / "tfirst3.fastq", "w") as fh:
        for r in first3:
            fh.write(f"@{r.name}\n{r.seq}\n+\n{r.qual}\n")
    run_pipeline(str(tmp_path / "tfirst3.fastq"),
                 str(tmp_path / "splint.fasta"), small,
                 PipelineConfig(group_size=3), TpuBackend())
    man_small = {
        "key": cfg.resume_key(str(tmp_path / "reads.fastq"),
                              str(tmp_path / "splint.fasta")),
        "groups_done": 1,
        "files": {
            "Splint1/R2C2_Consensus.fasta": os.path.getsize(
                os.path.join(small, "Splint1", "R2C2_Consensus.fasta")),
            "Splint1/R2C2_Subreads.fastq": os.path.getsize(
                os.path.join(small, "Splint1", "R2C2_Subreads.fastq")),
        },
        "stats": {"total_reads": 3, "short_reads": 0, "no_splint": 0,
                  "consensus_written": sum(
                      1 for _ in read_fastx(os.path.join(
                          small, "Splint1", "R2C2_Consensus.fasta")))},
    }
    resumed = str(tmp_path / "tresumed")
    os.makedirs(os.path.join(resumed, "Splint1"), exist_ok=True)
    import shutil
    for f in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        shutil.copy(os.path.join(small, "Splint1", f),
                    os.path.join(resumed, "Splint1", f))
    json.dump(man_small, open(os.path.join(resumed, MANIFEST), "w"))

    run_pipeline(str(tmp_path / "reads.fastq"),
                 str(tmp_path / "splint.fasta"), resumed,
                 PipelineConfig(group_size=3, resume=True), TpuBackend())
    for f in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(full, "Splint1", f)).read()
        b = open(os.path.join(resumed, "Splint1", f)).read()
        assert a == b, f"{f} differs after deep-pipeline resume"


def test_seek_resume_skips_completed_input(tmp_path, monkeypatch):
    """Resuming from a manifest with next_offset must SEEK (start
    mid-file) rather than re-parse completed input, and the final
    output must be byte-identical to an uninterrupted run."""
    import c3poa_tpu.io.fastx as fastx
    import c3poa_tpu.pipeline.run as R
    from c3poa_tpu.utils.mem import RssRestartNeeded

    reads, splints = sim.make_dataset(
        n_reads=9, seed=13, insert_len=(300, 500), copies=(3, 5),
        error=0.04)
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    args = (str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"))

    clean = str(tmp_path / "clean")
    run_pipeline(*args, clean, PipelineConfig(group_size=3, lencutoff=100))

    starts = []
    orig = fastx.read_fastq_offsets

    def spy(path, start_offset=0):
        starts.append(start_offset)
        return orig(path, start_offset)

    monkeypatch.setattr(fastx, "read_fastq_offsets", spy)
    out = str(tmp_path / "restarted")
    cfg = PipelineConfig(group_size=3, lencutoff=100, resume=True,
                         rss_restart_mb=1)  # restart after every group
    sessions = 0
    while True:
        sessions += 1
        assert sessions < 20
        try:
            run_pipeline(*args, out, cfg)
            break
        except RssRestartNeeded:
            continue
    assert sessions > 1
    # every session after the first started mid-file
    assert starts[0] == 0 and all(s > 0 for s in starts[1:]), starts
    for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(clean, "Splint1", fname)).read()
        b = open(os.path.join(out, "Splint1", fname)).read()
        assert a == b, f"{fname} differs after seek-resume"
    log_a = open(os.path.join(clean, "c3poa.log")).read()
    log_b = open(os.path.join(out, "c3poa.log")).read()
    assert log_a == log_b  # short-read accounting identical


def test_rss_restart_in_process_with_deep_pipeline(tmp_path):
    """In-process catch-RssRestartNeeded-and-retry with an OVERLAP
    backend: RssRestartNeeded raised at a checkpoint while up to two
    preps are in flight must not leak their record-arena leases — the
    retry in the same process previously died with ArenaSlotCollision
    (ADVICE r3, medium)."""
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    from c3poa_tpu.utils.mem import RssRestartNeeded

    reads, splints = sim.make_dataset(
        n_reads=12, seed=17, insert_len=(300, 500), copies=(3, 5),
        error=0.04)
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    args = (str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"))

    clean = str(tmp_path / "clean")
    backend = TpuBackend()
    assert backend.supports_overlap  # the deep path is what's under test
    run_pipeline(*args, clean, PipelineConfig(group_size=3, lencutoff=100),
                 backend)

    out = str(tmp_path / "restarted")
    cfg = PipelineConfig(group_size=3, lencutoff=100, resume=True,
                         rss_restart_mb=1)  # restart after every group
    sessions = 0
    while True:
        sessions += 1
        assert sessions < 20
        try:
            run_pipeline(*args, out, cfg, backend)
            break
        except RssRestartNeeded:
            continue
    assert sessions > 1
    for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(clean, "Splint1", fname)).read()
        b = open(os.path.join(out, "Splint1", fname)).read()
        assert a == b, f"{fname} differs after in-process deep resume"
