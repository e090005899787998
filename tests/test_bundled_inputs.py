"""End-to-end tests on the reference's bundled real inputs: the 283-bp
splint (/root/reference/splint.fasta), the N-containing 5' adapter
(/root/reference/adapter.fasta) and the 12 real oligo-dT indexes
(/root/reference/oligodt_indexes.fasta)."""

import os

import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.io.fastx import read_fastx
from c3poa_tpu.pipeline.backend import NumpyBackend
from c3poa_tpu.pipeline.postprocess import (
    PostprocessConfig, match_index, run_postprocess,
)
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
from c3poa_tpu.ref.lev import sliding_min_distance
from c3poa_tpu.utils.seqs import encode, revcomp, revcomp_encoded

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference inputs not mounted")


def _load_fasta(path):
    return {r.name: r.seq for r in read_fastx(path)}


@pytest.fixture(scope="module")
def real_inputs():
    splints = _load_fasta(os.path.join(REF, "splint.fasta"))
    adapters = _load_fasta(os.path.join(REF, "adapter.fasta"))
    indexes = _load_fasta(os.path.join(REF, "oligodt_indexes.fasta"))
    return splints, adapters, indexes


def test_real_splint_shape(real_inputs):
    splints, adapters, indexes = real_inputs
    assert len(splints["Splint1"]) == 284
    assert "NNNNNNNN" in adapters["5Prime_adapter"]
    assert len(indexes) == 12 and all(len(s) == 10 for s in indexes.values())


def test_pipeline_with_real_splint(real_inputs, tmp_path):
    """Simulated R2C2 concatemers built around the real 283-bp splint run
    through the full pipeline: every read is assigned the splint and the
    consensus matches the ground-truth insert."""
    splints, _, _ = real_inputs
    rng = np.random.default_rng(0)
    reads = []
    for i in range(8):
        reads.append(sim.make_read(
            rng, f"real_{i}", splints["Splint1"], splint_name="Splint1",
            insert_len=int(rng.integers(700, 1400)),
            n_copies=int(rng.integers(3, 9)), error=0.04))
    sim.write_fastq(str(tmp_path / "reads.fastq"), reads)
    sim.write_fasta(str(tmp_path / "splint.fasta"),
                    {"Splint1": splints["Splint1"]})

    out = str(tmp_path / "out")
    stats = run_pipeline(str(tmp_path / "reads.fastq"),
                         str(tmp_path / "splint.fasta"), out,
                         PipelineConfig())
    assert stats.no_splint == 0
    assert stats.consensus_written == 8
    cons = {r.name.rsplit("_", 4)[0]: r.seq for r in read_fastx(
        os.path.join(out, "Splint1", "R2C2_Consensus.fasta"))}
    from c3poa_tpu.ref.lev import levenshtein
    splint = splints["Splint1"]
    half = len(splint) // 2
    for r in reads:
        got = cons[r.name]
        # subreads are cut at splint midpoints, so the consensus unit is
        # splint[half:] + insert + splint[:half] (in read orientation)
        expected = splint[half:] + r.insert + splint[:half]
        if r.strand == "-":
            expected = revcomp(expected)
        d = levenshtein(got, expected)
        assert d / len(expected) < 0.05, (r.name, d, len(expected))


def test_n_adapter_scoring(real_inputs):
    """The 8-N run in the real 5' adapter scores neutral: a filled-in
    occurrence scores len-8, and coordinates extrapolate across the Ns."""
    _, adapters, _ = real_inputs
    a5 = adapters["5Prime_adapter"]
    filled = a5.replace("NNNNNNNN", "ACGTACGT")
    rng = np.random.default_rng(3)
    read = sim.random_seq(rng, 200) + filled + sim.random_seq(rng, 200)

    b = NumpyBackend()
    res = b.adapter_hits([encode(read)],
                         [encode(a5), revcomp_encoded(encode(a5))],
                         [len(a5), len(a5)])
    s1, j1, qe1, ts1, qs1, s2 = [int(r[0, 0]) for r in res]
    assert s1 == len(a5) - 8            # Ns score 0, all others match
    assert ts1 == 200 and j1 == 200 + len(a5) - 1
    assert qs1 == 0 and qe1 == len(a5) - 1
    assert s2 <= 10                     # no second occurrence


def test_real_index_margins(real_inputs):
    """The 12 bundled indexes keep the reference's accept margin: every
    index matches its own 20-bp junction window (best<2) and no window
    is claimed by a second index within margin 1."""
    _, _, indexes = real_inputs
    seq_to_idx = {seq: name for name, seq in indexes.items()}
    rng = np.random.default_rng(5)
    for name, idx_seq in indexes.items():
        win = sim.random_seq(rng, 5) + idx_seq + sim.random_seq(rng, 5)
        assert match_index(win, seq_to_idx) == name
        # one substitution still demuxes (dist 1 < 2, margin > 1)
        mut = list(idx_seq)
        mut[3] = {"A": "C", "C": "G", "G": "T", "T": "A"}[mut[3]]
        win1 = sim.random_seq(rng, 5) + "".join(mut) + sim.random_seq(rng, 5)
        got = match_index(win1, seq_to_idx)
        assert got in (name, "-")  # never a *wrong* index
    # cross-index separation: sliding distance between any two indexes > 2
    names = list(indexes)
    for i, a in enumerate(names):
        for b_ in names[i + 1:]:
            assert sliding_min_distance(indexes[a], indexes[b_]) > 2, (a, b_)


def test_postprocess_with_real_adapters_and_indexes(real_inputs, tmp_path):
    """Consensus-shaped reads carrying the real adapters (N positions
    filled randomly, as sequencers emit them) demux against the real
    adapter file (with Ns) and the 12 real indexes."""
    _, adapters, indexes = real_inputs
    rng = np.random.default_rng(11)
    names = list(indexes)
    reads, expected = [], {}
    for i in range(12):
        idx = names[i]
        fill = sim.random_seq(rng, 8)
        filled = {
            "5Prime_adapter":
                adapters["5Prime_adapter"].replace("NNNNNNNN", fill),
            "3Prime_adapter": adapters["3Prime_adapter"],
        }
        direction = "+" if i % 2 == 0 else "-"
        name, seq, cdna = sim.make_consensus_like(
            rng, f"r_{i}", cdna_len=500, adapters=filled,
            index=indexes[idx], direction=direction, error=0.0)
        reads.append((name, seq))
        expected[name] = (idx, direction, cdna)

    with open(tmp_path / "cons.fasta", "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")
    out = str(tmp_path / "out")
    stats = run_postprocess(
        str(tmp_path / "cons.fasta"), out,
        os.path.join(REF, "adapter.fasta"),
        os.path.join(REF, "oligodt_indexes.fasta"),
        PostprocessConfig(trim=True))
    assert stats.total == 12
    assert stats.written == 12

    found = {}
    for idx_name in names + ["no_index_found"]:
        path = os.path.join(out, idx_name,
                            "R2C2_full_length_consensus_reads.fasta")
        if not os.path.exists(path):
            continue
        for rec in read_fastx(path):
            found[rec.name.rsplit("_", 1)[0]] = (idx_name, rec.seq)
    assert len(found) == 12
    for name, (idx, direction, cdna) in expected.items():
        got_idx, got_seq = found[name]
        assert got_idx == idx, f"{name}: routed to {got_idx}, want {idx}"
        assert cdna in got_seq, f"{name}: cDNA not reoriented 5'->3'"
