#!/usr/bin/env python3
"""(Re)generate the committed golden fixtures (tests/golden/).

The fixtures freeze the CPU backend's byte-exact output on a small
edge-covering corpus (normal / zero-repeat / dangling-heavy reads, two
splints) so cross-round regressions are caught at the byte level
(tests/test_golden.py) without re-deriving outputs.  Run this ONLY when
an intentional spec change lands, review the diff, and say so in the
commit message — the point of the fixtures is that they never change by
accident.

Usage: python tools/make_golden.py
"""

import os
import shutil
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from c3poa_tpu import sim  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def build_inputs(d: str) -> None:
    rng = np.random.default_rng(1234)
    splints = {"Splint1": sim.random_seq(rng, 200),
               "Splint2": sim.random_seq(rng, 240)}
    reads = []
    for i in range(24):
        copies = i % 7                       # 0..6; 0 = zero-repeat splice
        frag = (0.85, 0.85) if (copies == 0 or i % 5 == 0) else (0.4, 0.4)
        sp = "Splint1" if i % 3 else "Splint2"
        reads.append(sim.make_read(
            rng, name=f"goldread_{i}", splint=splints[sp], splint_name=sp,
            insert_len=int(rng.integers(400, 800)),
            n_copies=copies, error=0.05, frag_frac=frag))
    sim.write_fastq(os.path.join(d, "reads.fastq"), reads)
    sim.write_fasta(os.path.join(d, "splint.fasta"), splints)


def main():
    golden = os.path.abspath(GOLDEN)
    if os.path.exists(golden):
        shutil.rmtree(golden)
    os.makedirs(golden)
    build_inputs(golden)

    from c3poa_tpu.pipeline.backend import NumpyBackend
    from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
    out = os.path.join(golden, "expected")
    stats = run_pipeline(os.path.join(golden, "reads.fastq"),
                         os.path.join(golden, "splint.fasta"),
                         out, PipelineConfig(lencutoff=500, group_size=7),
                         NumpyBackend())
    # the manifest is run state, not expected output
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.startswith(".") or f == "c3poa_stats.json":
                os.remove(os.path.join(root, f))
    print(f"golden fixtures written to {golden} "
          f"(reads={stats.total_reads}, consensi={stats.consensus_written})")


if __name__ == "__main__":
    main()
