"""Frozen golden fixtures: the pipeline's byte-exact output on a small
edge-covering corpus (tests/golden/, generated once by
tools/make_golden.py and committed after review).

What this catches: ANY cross-round change to output bytes — consensus
calls, subread naming, header grammar, log accounting — without
re-deriving expectations.  What it does NOT claim: byte-parity with the
upstream C3POa binaries (conk/abPOA/racon/BLAT are not installable
here); the parity claim's epistemic status is spec-level, documented in
BASELINE.md and PARITY.md.

If a test here fails after an INTENTIONAL spec change, regenerate with
tools/make_golden.py, review the fixture diff, and say so in the commit
message.
"""

import os

import pytest

from c3poa_tpu.pipeline.backend import NumpyBackend
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

EXPECTED_FILES = (
    "c3poa.log",
    "Splint1/R2C2_Consensus.fasta",
    "Splint1/R2C2_Subreads.fastq",
    "Splint2/R2C2_Consensus.fasta",
    "Splint2/R2C2_Subreads.fastq",
)


def _run(tmp_path, backend):
    out = str(tmp_path / "out")
    run_pipeline(os.path.join(GOLDEN, "reads.fastq"),
                 os.path.join(GOLDEN, "splint.fasta"),
                 out, PipelineConfig(lencutoff=500, group_size=7), backend)
    return out


def _compare(out):
    for rel in EXPECTED_FILES:
        exp = open(os.path.join(GOLDEN, "expected", rel), "rb").read()
        got = open(os.path.join(out, rel), "rb").read()
        assert got == exp, (
            f"{rel} differs from the committed golden fixture; if this "
            f"is an intentional spec change, regenerate with "
            f"tools/make_golden.py and review the diff")


def test_golden_numpy_backend(tmp_path):
    _compare(_run(tmp_path, NumpyBackend()))


def test_golden_tpu_backend(tmp_path):
    pytest.importorskip("jax")
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    _compare(_run(tmp_path, TpuBackend()))
