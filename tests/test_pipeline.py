import gzip
import os

import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.io.fastx import read_fastx
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
from c3poa_tpu.ref import banded
from c3poa_tpu.utils import encode


def identity(a, b):
    band = max(256, 2 * abs(len(a) - len(b)) + 64)
    rec = banded.align_and_trace(a, b, band=band)
    return int(((rec.cover == 1) & (rec.base == b)).sum()) / max(len(a), len(b))


def rotated_truth(read, splints):
    """Expected consensus: [splint 2nd half][insert][splint 1st half]."""
    sp = splints[read.splint_name]
    h = len(sp) // 2
    rot = sp[h:] + read.insert + sp[:h]
    if read.strand == "-":
        from c3poa_tpu.utils.seqs import revcomp
        rot = revcomp(rot)
    return rot


@pytest.fixture(scope="module")
def small_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    reads, splints = sim.make_dataset(
        n_reads=10, seed=7, insert_len=(700, 1200), copies=(2, 6), error=0.05)
    # add a short read (filtered) and a junk read (no splint)
    rng = np.random.default_rng(0)
    import dataclasses
    junk = dataclasses.replace(
        reads[0], name="junk", seq=sim.random_seq(rng, 4000),
        qual="I" * 4000)
    shorty = dataclasses.replace(
        reads[0], name="shorty", seq=sim.random_seq(rng, 300), qual="I" * 300)
    all_reads = reads + [junk, shorty]
    sim.write_fastq(str(d / "reads.fastq"), all_reads)
    sim.write_fasta(str(d / "splint.fasta"), splints)
    out = str(d / "out")
    stats = run_pipeline(str(d / "reads.fastq"), str(d / "splint.fasta"),
                         out, PipelineConfig(group_size=5))
    return reads, splints, out, stats


def test_pipeline_stats(small_run):
    reads, splints, out, stats = small_run
    assert stats.short_reads == 1
    assert stats.no_splint == 1
    assert stats.total_reads == 11  # junk passes length filter
    assert stats.consensus_written >= 9


def test_pipeline_log_format(small_run):
    _, _, out, stats = small_run
    lines = open(os.path.join(out, "c3poa.log")).read().splitlines()
    assert lines[1] == f"Total reads: {stats.all_reads}"
    assert lines[2].startswith("No splint reads: 1 (")
    assert lines[3].startswith("Under len cutoff: 1 (")
    assert lines[5] == f"Reads after preprocessing: {stats.all_reads - 2}"


def test_pipeline_consensus_output(small_run):
    reads, splints, out, stats = small_run
    path = os.path.join(out, "Splint1", "R2C2_Consensus.fasta")
    recs = {r.name: r for r in read_fastx(path)}
    by_base = {}
    for name, rec in recs.items():
        parts = name.rsplit("_", 4)
        base, avg_q, raw_len, repeats, cons_len = (
            parts[0], float(parts[1]), int(parts[2]), int(parts[3]),
            int(parts[4]))
        assert cons_len == len(rec.seq)
        by_base[base] = (rec.seq, repeats, raw_len)
    sim_reads = {r.name: r for r in reads}
    assert set(by_base) <= set(sim_reads)
    n_good = 0
    for base, (seq, repeats, raw_len) in by_base.items():
        r = sim_reads[base]
        assert raw_len == len(r.seq)
        truth = rotated_truth(r, splints)
        ident = identity(encode(seq), encode(truth))
        if ident > 0.98:
            n_good += 1
    assert n_good >= len(by_base) - 1


def test_pipeline_output_in_input_order(small_run):
    reads, splints, out, _ = small_run
    path = os.path.join(out, "Splint1", "R2C2_Consensus.fasta")
    names = [r.name.rsplit("_", 4)[0] for r in read_fastx(path)]
    order = {r.name: i for i, r in enumerate(reads)}
    idx = [order[n] for n in names]
    assert idx == sorted(idx)


def test_pipeline_subreads_naming(small_run):
    reads, splints, out, _ = small_run
    path = os.path.join(out, "Splint1", "R2C2_Subreads.fastq")
    subs = list(read_fastx(path))
    assert len(subs) > 0
    # group by base read name; indices must be 0..k contiguous-ish:
    # core reads 1..r always present; 0 / r+1 only when danglings exist
    from collections import defaultdict
    by_base = defaultdict(list)
    for s in subs:
        base, idx = s.name.rsplit("_", 1)
        by_base[base].append(int(idx))
        assert s.qual is not None and len(s.qual) == len(s.seq)
    for base, idxs in by_base.items():
        assert len(set(idxs)) == len(idxs)
        core = [i for i in idxs if 1 <= i]
        assert core, f"{base}: {idxs}"


def test_pipeline_two_splints(tmp_path):
    reads, splints = sim.make_dataset(
        n_reads=8, seed=11, insert_len=(700, 900), copies=(2, 4),
        error=0.04,
        splints={"SplintA": sim.random_seq(np.random.default_rng(1), 200),
                 "SplintB": sim.random_seq(np.random.default_rng(2), 250)})
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    out = str(tmp_path / "out")
    run_pipeline(str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"), out,
                 PipelineConfig())
    for sp in ("SplintA", "SplintB"):
        expected = {r.name for r in reads if r.splint_name == sp}
        if not expected:
            continue
        path = os.path.join(out, sp, "R2C2_Consensus.fasta")
        got = {r.name.rsplit("_", 4)[0] for r in read_fastx(path)}
        # demux routing must be correct for every written read
        assert got <= expected


def test_pipeline_compress(tmp_path):
    reads, splints = sim.make_dataset(n_reads=3, seed=3, copies=(3, 4))
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    out = str(tmp_path / "out")
    run_pipeline(str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"), out,
                 PipelineConfig(compress=True))
    path = os.path.join(out, "Splint1", "R2C2_Consensus.fasta.gz")
    with gzip.open(path, "rt") as fh:
        assert fh.readline().startswith(">")


def test_pipeline_multiprocessing_matches_serial(tmp_path):
    reads, splints = sim.make_dataset(n_reads=6, seed=31, insert_len=(600, 800),
                                      copies=(2, 4), error=0.05)
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    out1 = str(tmp_path / "serial")
    out2 = str(tmp_path / "mp")
    from c3poa_tpu.pipeline.backend import NumpyBackend
    run_pipeline(str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"), out1,
                 PipelineConfig(group_size=2), NumpyBackend())
    run_pipeline(str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"), out2,
                 PipelineConfig(group_size=2, num_threads=3), NumpyBackend())
    for f in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(os.path.join(out1, "Splint1", f)).read()
        b = open(os.path.join(out2, "Splint1", f)).read()
        assert a == b, f
    assert open(os.path.join(out1, "c3poa.log")).read() == \
        open(os.path.join(out2, "c3poa.log")).read()


def test_pipeline_high_repeat_stress(tmp_path):
    # BASELINE config 4: 8-30 subreads per read
    reads, splints = sim.make_dataset(
        n_reads=4, seed=41, insert_len=(500, 900), copies=(8, 30), error=0.06)
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    out = str(tmp_path / "out")
    stats = run_pipeline(str(tmp_path / "r.fastq"), str(tmp_path / "s.fasta"),
                         out, PipelineConfig())
    assert stats.consensus_written == 4
    for rec in read_fastx(os.path.join(out, "Splint1", "R2C2_Consensus.fasta")):
        name = rec.name.rsplit("_", 4)
        base, repeats = name[0], int(name[3])
        r = next(x for x in reads if x.name == base)
        assert repeats >= r.n_copies - 2  # most copies recovered as subreads
        truth = rotated_truth(r, splints)
        assert identity(encode(rec.seq), encode(truth)) > 0.99


def test_cli_blat_threads_chunking(tmp_path):
    """-b with -n chunks reads into one group per worker
    (reference bin/preprocess.py:81-84) — same bytes as default grouping."""
    from c3poa_tpu import cli, sim

    reads, splints = sim.make_dataset(n_reads=9, seed=12,
                                      insert_len=(300, 500), copies=(2, 4))
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    base = ["-r", str(tmp_path / "r.fastq"), "-s", str(tmp_path / "s.fasta"),
            "-l", "500", "--backend", "numpy"]
    cli.main(base + ["-o", str(tmp_path / "o1")])
    cli.main(base + ["-o", str(tmp_path / "o2"), "-n", "3", "-b"])
    a = open(tmp_path / "o1" / "Splint1" / "R2C2_Consensus.fasta").read()
    b = open(tmp_path / "o2" / "Splint1" / "R2C2_Consensus.fasta").read()
    assert a == b

def test_pipeline_gzip_input(tmp_path):
    """Gzip-compressed input fastq: accepted via the '.gz' suffix AND via
    magic-byte sniffing with no suffix (io/fastx.py:28-33); output is
    byte-identical to the plain-text run."""
    reads, splints = sim.make_dataset(n_reads=4, seed=21, copies=(2, 4))
    plain = str(tmp_path / "r.fastq")
    sim.write_fastq(plain, reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    data = open(plain, "rb").read()
    gz_suffixed = str(tmp_path / "r.fastq.gz")
    with gzip.open(gz_suffixed, "wb") as fh:
        fh.write(data)
    gz_bare = str(tmp_path / "r_nosuffix.fastq")  # gzip bytes, no .gz name
    with open(gz_bare, "wb") as fh:
        fh.write(open(gz_suffixed, "rb").read())

    outs = []
    for i, path in enumerate([plain, gz_suffixed, gz_bare]):
        out = str(tmp_path / f"out{i}")
        run_pipeline(path, str(tmp_path / "s.fasta"), out, PipelineConfig())
        outs.append(out)
    for kind in ["R2C2_Consensus.fasta", "R2C2_Subreads.fastq"]:
        ref_txt = open(os.path.join(outs[0], "Splint1", kind)).read()
        assert ref_txt
        for out in outs[1:]:
            assert open(os.path.join(out, "Splint1", kind)).read() == ref_txt


def test_cli_mesh_devices_auto(tmp_path):
    """--backend tpu --mesh_devices auto shards every kernel batch over
    all local devices (the 8-device virtual CPU mesh here; a v5e-8 host
    in production) from a single process, byte-identical to numpy."""
    from c3poa_tpu import cli, sim

    reads, splints = sim.make_dataset(n_reads=10, seed=21,
                                      insert_len=(300, 500), copies=(2, 5))
    sim.write_fastq(str(tmp_path / "r.fastq"), reads)
    sim.write_fasta(str(tmp_path / "s.fasta"), splints)
    base = ["-r", str(tmp_path / "r.fastq"), "-s", str(tmp_path / "s.fasta"),
            "-l", "500", "-g", "7"]  # group of 7: pads to the 8-mesh
    cli.main(base + ["-o", str(tmp_path / "om"), "--backend", "tpu",
                     "--mesh_devices", "auto"])
    cli.main(base + ["-o", str(tmp_path / "on"), "--backend", "numpy"])
    for f in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
        a = open(tmp_path / "om" / "Splint1" / f, "rb").read()
        b = open(tmp_path / "on" / "Splint1" / f, "rb").read()
        assert a == b, f

    import c3poa_tpu.cli as climod
    assert climod._local_mesh("1") is None
    assert climod._local_mesh("auto").devices.size == 8
    assert climod._local_mesh("4").devices.size == 4


def test_backend_auto_probe_fallback(tmp_path, monkeypatch, capsys):
    """--backend auto degrades to numpy when the accelerator probe fails
    (dead relay = device init hangs; the probe subprocess turns that
    into a fallback instead of a wedge)."""
    from c3poa_tpu.cli import pick_backend
    from c3poa_tpu.pipeline.backend import NumpyBackend
    from c3poa_tpu.utils.probe import probe_accelerator

    # a live-cpu probe passes through to the jax backend
    assert probe_accelerator() == "cpu"

    # an unknown platform makes the probe subprocess error -> None
    monkeypatch.setenv("JAX_PLATFORMS", "bogus_platform")
    assert probe_accelerator() is None
    backend = pick_backend("auto")
    assert isinstance(backend, NumpyBackend)
    assert "probe failed" in capsys.readouterr().err

    # C3POA_SKIP_PROBE bypasses the subprocess entirely
    monkeypatch.setenv("C3POA_SKIP_PROBE", "1")
    assert probe_accelerator() == "skipped"
