#!/usr/bin/env python3
"""Bucket-ladder stress: long reads, high copy counts (SURVEY §5).

Generates the survey's long-context envelope — inserts up to ~5 kb,
up to 30 copies, raw reads up to ~50 kb+ — runs the full pipeline twice
on the selected backend, and reports reads/s plus the compile/padding
telemetry from c3poa_stats.json.  "No per-run recompiles" shows as
locate/align_compiled_shapes == 0 on the second run.

Usage: python tools/stress_bigreads.py [n_reads] [backend]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from c3poa_tpu import sim  # noqa: E402
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline  # noqa: E402


def make_big_dataset(path, n_reads, seed=0):
    rng = np.random.default_rng(seed)
    splints = {"Splint1": sim.random_seq(rng, 284)}
    reads = []
    for i in range(n_reads):
        insert_len = int(rng.integers(1000, 5000))
        # cap raw length near ~60 kb
        max_copies = max(2, min(30, 55000 // (insert_len + 284)))
        copies = int(rng.integers(2, max_copies + 1))
        reads.append(sim.make_read(
            rng, f"big_{i}", splints["Splint1"], insert_len=insert_len,
            n_copies=copies, error=0.05))
    sim.write_fastq(os.path.join(path, "reads.fastq"), reads)
    sim.write_fasta(os.path.join(path, "splint.fasta"), splints)
    lens = [len(r.seq) for r in reads]
    cps = [r.n_copies for r in reads]
    print(f"reads: n={n_reads} len {min(lens)}..{max(lens)} "
          f"(mean {sum(lens) // n_reads}), copies {min(cps)}..{max(cps)}",
          flush=True)
    return reads


def make_backend(backend_name):
    if backend_name == "numpy":
        from c3poa_tpu.pipeline.backend import NumpyBackend
        return NumpyBackend()
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    return TpuBackend()


def run(path, out, backend):
    t0 = time.time()
    stats = run_pipeline(os.path.join(path, "reads.fastq"),
                         os.path.join(path, "splint.fasta"), out,
                         PipelineConfig(), backend)
    dt = time.time() - t0
    st = json.load(open(os.path.join(out, "c3poa_stats.json")))
    return stats, dt, st


def main(n_reads=128, backend="tpu"):
    with tempfile.TemporaryDirectory() as d:
        make_big_dataset(d, n_reads)
        be = make_backend(backend)  # shared: run-2 compile counts must be 0
        s1, dt1, st1 = run(d, os.path.join(d, "o1"), be)
        s2, dt2, st2 = run(d, os.path.join(d, "o2"), be)
        for tag, s, dt, st in (("warm", s1, dt1, st1),
                               ("steady", s2, dt2, st2)):
            c = st["counters"]
            pad = c.get("align_cells_padded", 0)
            real = max(c.get("align_cells", 1), 1)
            print(f"{tag}: {s.consensus_written}/{s.total_reads} consensi, "
                  f"{dt:.1f}s = {s.total_reads / dt:.1f} reads/s; "
                  f"stages {st['stages_s']}; "
                  f"locate_shapes={c.get('locate_compiled_shapes', 0)} "
                  f"align_shapes={c.get('align_compiled_shapes', 0)} "
                  f"align_pad_ratio={pad / real:.2f}", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    b = sys.argv[2] if len(sys.argv) > 2 else "tpu"
    main(n, b)
