"""Multi-host distribution: group sharding, span-interleaved merge, and a
real 2-process CPU run (jax.distributed + gloo collectives) that must be
byte-identical to the single-process run."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from c3poa_tpu.parallel.dist import (
    allreduce_stats, host_shard_groups, merge_host_outputs,
)
from c3poa_tpu.pipeline.run import MANIFEST


def test_host_shard_groups_round_robin():
    groups = [[i] for i in range(10)]
    got0 = list(host_shard_groups(iter(groups), 0, 3))
    got1 = list(host_shard_groups(iter(groups), 1, 3))
    got2 = list(host_shard_groups(iter(groups), 2, 3))
    assert [g for g, _ in got0] == [0, 3, 6, 9]
    assert [g for g, _ in got1] == [1, 4, 7]
    assert [g for g, _ in got2] == [2, 5, 8]
    all_groups = sorted(got0 + got1 + got2)
    assert [g for g, _ in all_groups] == list(range(10))


def test_allreduce_stats_single_process():
    assert allreduce_stats({"a": 3, "b": 5}) == {"a": 3, "b": 5}


def _write_host(tmp_path, h, groups):
    """groups: list of (gi, {relfile: text_to_append})."""
    d = tmp_path / f"host_{h}"
    os.makedirs(d, exist_ok=True)
    sizes: dict = {}
    span_groups = []
    for gi, files in groups:
        for rel, text in files.items():
            p = d / rel
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "a") as fh:
                fh.write(text)
            sizes[rel] = os.path.getsize(p)
        span_groups.append({"gi": gi, "sizes": dict(sizes)})
    with open(d / MANIFEST, "w") as fh:
        json.dump({"key": {}, "groups_done": groups[-1][0],
                   "files": sizes, "stats": {},
                   "span_groups": span_groups}, fh)


def test_merge_host_outputs_interleaves_by_group(tmp_path):
    """Round-robin over 2 hosts with 2 groups each: merged record order
    must be group order 1,2,3,4 — not host-major 1,3,2,4."""
    rel = "Splint1/R2C2_Consensus.fasta"
    _write_host(tmp_path, 0, [(1, {rel: ">g1\nAA\n"}),
                              (3, {rel: ">g3\nCC\n"})])
    _write_host(tmp_path, 1, [(2, {rel: ">g2\nGG\n"}),
                              (4, {rel: ">g4\nTT\n"})])
    merge_host_outputs(str(tmp_path), 2)
    got = (tmp_path / rel).read_text()
    assert got == ">g1\nAA\n>g2\nGG\n>g3\nCC\n>g4\nTT\n"


def test_merge_host_outputs_lazy_files(tmp_path):
    """Files that only some hosts/groups touch merge correctly (a splint
    seen only by host 1, a subread file appearing late)."""
    a = "S1/R2C2_Consensus.fasta"
    b = "S2/R2C2_Consensus.fasta"
    _write_host(tmp_path, 0, [(1, {a: "r1\n"}), (3, {a: "r3\n"})])
    _write_host(tmp_path, 1, [(2, {b: "x2\n"}), (4, {a: "r4\n", b: "x4\n"})])
    merge_host_outputs(str(tmp_path), 2)
    assert (tmp_path / a).read_text() == "r1\nr3\nr4\n"
    assert (tmp_path / b).read_text() == "x2\nx4\n"


def _tree(out, skip_prefixes=("host_", ".")):
    found = {}
    for root, dirs, files in os.walk(out):
        dirs[:] = [d for d in dirs
                   if not any(d.startswith(p) for p in skip_prefixes)]
        for f in files:
            if f.startswith(".") or f.endswith(".json"):
                continue
            p = os.path.join(root, f)
            found[os.path.relpath(p, out)] = open(p, "rb").read()
    return found


@pytest.mark.slow
def test_two_process_cpu_run_matches_single(tmp_path):
    """Full pipeline over 2 jax.distributed CPU processes: merged output
    (and the allreduced c3poa.log) is byte-identical to 1 process."""
    from c3poa_tpu import sim

    reads, splints = sim.make_dataset(
        n_reads=10, seed=3, insert_len=(300, 600), copies=(3, 6),
        error=0.04)
    sim.write_fastq(str(tmp_path / "reads.fastq"), reads)
    sim.write_fasta(str(tmp_path / "splint.fasta"), splints)

    base = [sys.executable, "-m", "c3poa_tpu.cli",
            "-r", str(tmp_path / "reads.fastq"),
            "-s", str(tmp_path / "splint.fasta"),
            "-l", "500", "-g", "2", "--backend", "numpy"]
    env = dict(os.environ, C3POA_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               C3POA_PROGRESS="0")

    out1 = str(tmp_path / "out1")
    subprocess.run(base + ["-o", out1], check=True, env=env, timeout=900)

    out2 = str(tmp_path / "out2")
    port = 20000 + os.getpid() % 10000
    procs = [subprocess.Popen(
        base + ["-o", out2, "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(i)],
        env=env) for i in range(2)]
    for p in procs:
        assert p.wait(timeout=900) == 0

    t1, t2 = _tree(out1), _tree(out2)
    assert set(t1) == set(t2), (sorted(t1), sorted(t2))
    for rel in t1:
        assert t1[rel] == t2[rel], f"{rel} differs"


@pytest.mark.slow
def test_two_process_postprocess_matches_single(tmp_path):
    """Postprocess CLI over 2 jax.distributed CPU processes (round-robin
    group sharding + span-interleaved merge, VERDICT r2 item 4): merged
    trees byte-identical to the 1-process run — including the demux
    subdirectories and the multiplexing tsv."""
    from c3poa_tpu import sim

    rng = np.random.default_rng(17)
    indexes = {f"Index{i}": sim.random_seq(np.random.default_rng(400 + i),
                                           10) for i in range(1, 5)}
    with open(tmp_path / "cons.fasta", "w") as fh:
        for i in range(25):
            name, seq, _ = sim.make_consensus_like(
                rng, f"c_{i}", cdna_len=400,
                index=indexes[f"Index{(i % 4) + 1}"],
                direction="+" if i % 2 == 0 else "-", error=0.01)
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(tmp_path / "adapters.fasta"),
                    dict(sim.DEFAULT_ADAPTERS))
    sim.write_fasta(str(tmp_path / "indexes.fasta"), indexes)

    base = [sys.executable, "-m", "c3poa_tpu.cli_postprocess",
            "-i", str(tmp_path / "cons.fasta"),
            "-a", str(tmp_path / "adapters.fasta"),
            "-x", str(tmp_path / "indexes.fasta"),
            "-t", "-g", "4", "--backend", "numpy"]
    env = dict(os.environ, C3POA_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               C3POA_PROGRESS="0")

    out1 = str(tmp_path / "p1")
    subprocess.run(base + ["-o", out1], check=True, env=env, timeout=900)

    out2 = str(tmp_path / "p2")
    port = 22000 + os.getpid() % 10000
    procs = [subprocess.Popen(
        base + ["-o", out2, "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(i)],
        env=env) for i in range(2)]
    for p in procs:
        assert p.wait(timeout=900) == 0

    t1, t2 = _tree(out1), _tree(out2)
    assert set(t1) == set(t2), (sorted(t1), sorted(t2))
    for rel in t1:
        assert t1[rel] == t2[rel], f"{rel} differs"


@pytest.mark.slow
def test_two_process_deep_pipeline_matches_single(tmp_path):
    """Same 2-process byte-parity but through the kernel backend's
    3-stage deep pipeline (backend auto -> TpuBackend on the CPU test
    env).  Guards the record-arena slot logic: under round-robin
    ownership a host preps CONSECUTIVE owned groups, so slots must be
    counted per host, not by global group index.  The 2-process arms
    also mesh 2 local devices each (--mesh_devices 2): multi-host x
    multi-chip combined, still byte-identical to 1 process x 1
    device."""
    from c3poa_tpu import sim

    reads, splints = sim.make_dataset(
        n_reads=10, seed=4, insert_len=(300, 600), copies=(3, 6),
        error=0.04)
    sim.write_fastq(str(tmp_path / "reads.fastq"), reads)
    sim.write_fasta(str(tmp_path / "splint.fasta"), splints)

    base = [sys.executable, "-m", "c3poa_tpu.cli",
            "-r", str(tmp_path / "reads.fastq"),
            "-s", str(tmp_path / "splint.fasta"),
            "-l", "500", "-g", "2", "--backend", "auto"]
    env = dict(os.environ, C3POA_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               C3POA_PROGRESS="0")

    out1 = str(tmp_path / "t1")
    # generous timeouts: each subprocess compiles the CPU XLA kernels
    # fresh, which is minutes-slow under full-suite load
    subprocess.run(base + ["-o", out1], check=True, env=env, timeout=900)

    out2 = str(tmp_path / "t2")
    port = 21000 + os.getpid() % 10000
    procs = [subprocess.Popen(
        base + ["-o", out2, "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(i),
                "--mesh_devices", "2"],
        env=env) for i in range(2)]
    for p in procs:
        assert p.wait(timeout=900) == 0

    t1, t2 = _tree(out1), _tree(out2)
    assert set(t1) == set(t2), (sorted(t1), sorted(t2))
    for rel in t1:
        assert t1[rel] == t2[rel], f"{rel} differs"
