"""BASELINE config 3: the full pipeline chain — R2C2 reads whose inserts
carry adapters + oligo-dT index, through consensus calling and then
postprocessing (trim, reorient, demux) — checked against ground truth."""

import os

import numpy as np

from c3poa_tpu import sim
from c3poa_tpu.io.fastx import read_fastx
from c3poa_tpu.pipeline.postprocess import PostprocessConfig, run_postprocess
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
from c3poa_tpu.ref import banded
from c3poa_tpu.utils import encode
from c3poa_tpu.utils.seqs import revcomp


def test_consensus_then_postprocess_chain(tmp_path):
    rng = np.random.default_rng(77)
    splint = sim.random_seq(rng, 200)
    adapters = dict(sim.DEFAULT_ADAPTERS)
    indexes = {f"Index{i}": sim.random_seq(np.random.default_rng(800 + i), 10)
               for i in range(1, 4)}

    reads, truth = [], {}
    for i in range(6):
        idx = f"Index{(i % 3) + 1}"
        # a cDNA molecule with adapters + index, as the R2C2 insert
        cdna = sim.random_seq(rng, 700)
        w = sim.random_seq(rng, 3) + indexes[idx] + sim.random_seq(rng, 3)
        insert = (adapters["5Prime_adapter"] + cdna + revcomp(w) +
                  revcomp(adapters["3Prime_adapter"]))
        r = sim.make_read(rng, f"mol_{i}", splint, insert_len=10,
                          n_copies=int(rng.integers(3, 7)), error=0.04)
        # rebuild with the structured insert (make_read generated a random
        # insert; splice ours in by regenerating the concatemer)
        r = sim.SimRead(
            name=f"mol_{i}", seq="", qual="", insert=insert,
            splint_name="Splint1", strand="+", n_copies=r.n_copies)
        parts = []
        for _ in range(r.n_copies):
            parts.append(sim.mutate(rng, splint, 0.02, 0.01, 0.01))
            parts.append(sim.mutate(rng, insert, 0.02, 0.01, 0.01))
        parts.append(sim.mutate(rng, splint, 0.02, 0.01, 0.01))
        seq = sim.random_seq(rng, 300) + "".join(parts) + \
            sim.random_seq(rng, 300)
        q = np.clip(np.random.default_rng(i).normal(25, 3, len(seq)), 3, 40)
        r = sim.SimRead(r.name, seq, sim.array_to_phred_like(q)
                        if hasattr(sim, "array_to_phred_like") else
                        "".join(chr(int(x) + 33) for x in q),
                        insert, "Splint1", "+", r.n_copies)
        reads.append(r)
        truth[r.name] = (idx, cdna)

    sim.write_fastq(str(tmp_path / "reads.fastq"), reads)
    sim.write_fasta(str(tmp_path / "splint.fasta"), {"Splint1": splint})
    sim.write_fasta(str(tmp_path / "adapters.fasta"), adapters)
    sim.write_fasta(str(tmp_path / "indexes.fasta"), indexes)

    cons_out = str(tmp_path / "cons")
    stats = run_pipeline(str(tmp_path / "reads.fastq"),
                         str(tmp_path / "splint.fasta"), cons_out,
                         PipelineConfig())
    assert stats.consensus_written == 6

    post_out = str(tmp_path / "post")
    pstats = run_postprocess(
        os.path.join(cons_out, "Splint1", "R2C2_Consensus.fasta"),
        post_out, str(tmp_path / "adapters.fasta"),
        str(tmp_path / "indexes.fasta"), PostprocessConfig(trim=True))
    assert pstats.written >= 5  # allow one marginal demux failure

    found = {}
    for idx_name in list(indexes) + ["no_index_found"]:
        p = os.path.join(post_out, idx_name,
                         "R2C2_full_length_consensus_reads.fasta")
        if not os.path.exists(p):
            continue
        for rec in read_fastx(p):
            base = rec.name.split("_")[0] + "_" + rec.name.split("_")[1]
            found[base] = (idx_name, rec.seq)

    n_good = 0
    for name, (want_idx, cdna) in truth.items():
        if name not in found:
            continue
        got_idx, got_seq = found[name]
        if got_idx != want_idx:
            continue
        # trimmed + oriented output must contain the cDNA at high identity
        a, b = encode(got_seq), encode(cdna)
        band = max(256, 2 * abs(len(a) - len(b)) + 64)
        rec = banded.align_and_trace(b, a, band=band)
        ident = int(((rec.cover == 1) & (rec.base == a)).sum()) / len(b)
        if ident > 0.98:
            n_good += 1
    assert n_good >= 5, f"only {n_good} molecules fully recovered"
