"""Chaos/fault tests (SURVEY.md §5: the reference silently loses a
group when a worker fails, C3POa.py:245-248 — this framework must
surface failures loudly, and a SIGKILL mid-run must resume
byte-identically)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from c3poa_tpu import sim
from c3poa_tpu.pipeline.postprocess import (
    PostprocessConfig, run_postprocess,
)
from c3poa_tpu.pipeline.run import (
    MANIFEST, PipelineConfig, run_pipeline,
)
from c3poa_tpu.utils.procpool import WorkerDied, WorkerFailed


def _dataset(tmp_path, n_reads=8, seed=5):
    reads, splints = sim.make_dataset(
        n_reads=n_reads, seed=seed, insert_len=(300, 500), copies=(3, 5),
        error=0.04)
    sim.write_fastq(str(tmp_path / "reads.fastq"), reads)
    sim.write_fasta(str(tmp_path / "splint.fasta"), splints)


def test_worker_exception_surfaces(tmp_path, monkeypatch):
    """A worker exception must raise in the parent naming the group —
    never vanish like the reference's apply_async callback."""
    _dataset(tmp_path)
    monkeypatch.setenv("C3POA_FAULT_GROUP", "1:raise")
    with pytest.raises(WorkerFailed, match="group 1"):
        run_pipeline(str(tmp_path / "reads.fastq"),
                     str(tmp_path / "splint.fasta"),
                     str(tmp_path / "out"),
                     PipelineConfig(group_size=2, num_threads=2,
                                    lencutoff=100))


def test_worker_death_surfaces_not_hangs(tmp_path, monkeypatch):
    """A worker killed abruptly (os._exit — the SIGKILL/OOM shape) must
    raise WorkerDied promptly instead of hanging on the lost result
    (multiprocessing.Pool.imap would wait forever)."""
    _dataset(tmp_path)
    monkeypatch.setenv("C3POA_FAULT_GROUP", "2:kill")
    t0 = time.time()
    with pytest.raises(WorkerDied, match="worker"):
        run_pipeline(str(tmp_path / "reads.fastq"),
                     str(tmp_path / "splint.fasta"),
                     str(tmp_path / "out"),
                     PipelineConfig(group_size=2, num_threads=2,
                                    lencutoff=100))
    assert time.time() - t0 < 120  # detected, not a hang


def test_postprocess_worker_failures_surface(tmp_path, monkeypatch):
    rng_adapters = dict(sim.DEFAULT_ADAPTERS)
    import numpy as np
    rng = np.random.default_rng(6)
    with open(tmp_path / "cons.fasta", "w") as fh:
        for i in range(10):
            name, seq, _ = sim.make_consensus_like(rng, f"c_{i}",
                                                   cdna_len=300)
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(tmp_path / "adapters.fasta"), rng_adapters)

    monkeypatch.setenv("C3POA_FAULT_GROUP", "1:raise")
    with pytest.raises(WorkerFailed, match="group 1"):
        run_postprocess(str(tmp_path / "cons.fasta"), str(tmp_path / "o"),
                        str(tmp_path / "adapters.fasta"), None,
                        PostprocessConfig(group_size=3, threads=2))
    monkeypatch.setenv("C3POA_FAULT_GROUP", "0:kill")
    with pytest.raises(WorkerDied):
        run_postprocess(str(tmp_path / "cons.fasta"), str(tmp_path / "o2"),
                        str(tmp_path / "adapters.fasta"), None,
                        PostprocessConfig(group_size=3, threads=2))


def _tree(out):
    found = {}
    for root, dirs, files in os.walk(out):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        for f in files:
            if f.startswith(".") or f.endswith(".json"):
                continue
            p = os.path.join(root, f)
            found[os.path.relpath(p, out)] = open(p, "rb").read()
    return found


@pytest.mark.slow
def test_sigkill_midrun_deep_pipeline_resume(tmp_path):
    """kill -9 the CLI mid-run under the 3-stage deep pipeline (backend
    auto -> TpuBackend on the CPU test env), then --resume: the completed
    output tree must be byte-identical to an uninterrupted run.  Guards
    the manifest/byte-span restore against partial trailing writes the
    SIGKILL leaves behind."""
    _dataset(tmp_path, n_reads=12, seed=7)
    base = [sys.executable, "-m", "c3poa_tpu.cli",
            "-r", str(tmp_path / "reads.fastq"),
            "-s", str(tmp_path / "splint.fasta"),
            "-l", "100", "-g", "2", "--backend", "auto"]
    env = dict(os.environ, C3POA_FORCE_CPU="1", JAX_PLATFORMS="cpu",
               C3POA_PROGRESS="0")

    clean = str(tmp_path / "clean")
    subprocess.run(base + ["-o", clean], check=True, env=env, timeout=900)

    out = str(tmp_path / "killed")
    proc = subprocess.Popen(base + ["-o", out, "--resume"], env=env)
    manifest = os.path.join(out, MANIFEST)
    deadline = time.time() + 600
    killed_mid = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid run
        try:
            m = json.load(open(manifest))
            if m.get("groups_done", 0) >= 2:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait(timeout=60)
                killed_mid = proc.returncode != 0
                break
        except (OSError, ValueError):
            pass
        time.sleep(0.05)
    assert proc.poll() is not None, "CLI neither progressed nor exited"

    # resume to completion
    subprocess.run(base + ["-o", out, "--resume"], check=True, env=env,
                   timeout=900)
    t1, t2 = _tree(clean), _tree(out)
    assert set(t1) == set(t2), (sorted(t1), sorted(t2))
    for rel in t1:
        assert t1[rel] == t2[rel], f"{rel} differs"
    assert killed_mid, "run finished before SIGKILL; tighten the timing"


def _identity(x):
    return x


def _return_lambda(x):
    return lambda: x  # unpicklable


def test_unpicklable_result_raises_not_hangs():
    """A worker result that fails to pickle must surface as WorkerFailed
    (the worker pickles inside its reporting try block) — mp.Queue's
    feeder thread would otherwise drop it and hang the parent forever."""
    from c3poa_tpu.utils.procpool import imap_strict

    t0 = time.time()
    with pytest.raises(WorkerFailed, match="pickle|Pickling"):
        list(imap_strict(_return_lambda, [1, 2], workers=2))
    assert time.time() - t0 < 60


def test_imap_strict_labels_name_real_groups():
    """Errors name the caller-supplied group label, not the 0-based
    submission index (resume/multihost skip groups before submission)."""
    from c3poa_tpu.utils.procpool import imap_strict

    os.environ["C3POA_FAULT_GROUP"] = "7:raise"
    try:
        with pytest.raises(WorkerFailed, match="group 7"):
            list(imap_strict(_identity, [(7, "payload")], workers=1,
                             label=lambda pl: pl[0]))
    finally:
        del os.environ["C3POA_FAULT_GROUP"]


def test_rss_restart_supervisor_byte_identical(tmp_path):
    """--rss-restart-mb 1 forces a clean restart after every new group
    (any real process exceeds 1 MB); the supervisor must relaunch via
    --resume until completion with output byte-identical to a single
    uninterrupted run."""
    _dataset(tmp_path, n_reads=8, seed=9)
    base = [sys.executable, "-m", "c3poa_tpu.cli",
            "-r", str(tmp_path / "reads.fastq"),
            "-s", str(tmp_path / "splint.fasta"),
            "-l", "100", "-g", "2", "--backend", "numpy"]
    env = dict(os.environ, C3POA_PROGRESS="0")

    clean = str(tmp_path / "clean")
    subprocess.run(base + ["-o", clean], check=True, env=env, timeout=900)

    out = str(tmp_path / "supervised")
    r = subprocess.run(base + ["-o", out, "--rss-restart-mb", "1"],
                       env=env, timeout=900, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "restart(s)" in r.stderr  # it really did restart
    t1, t2 = _tree(clean), _tree(out)
    assert set(t1) == set(t2)
    for rel in t1:
        assert t1[rel] == t2[rel], f"{rel} differs"


def test_postprocess_rss_restart_supervisor(tmp_path):
    """Same restart loop for the postprocess CLI."""
    import numpy as np
    rng = np.random.default_rng(11)
    with open(tmp_path / "cons.fasta", "w") as fh:
        for i in range(9):
            name, seq, _ = sim.make_consensus_like(rng, f"c_{i}",
                                                   cdna_len=300)
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(tmp_path / "adapters.fasta"),
                    dict(sim.DEFAULT_ADAPTERS))
    base = [sys.executable, "-m", "c3poa_tpu.cli_postprocess",
            "-i", str(tmp_path / "cons.fasta"),
            "-a", str(tmp_path / "adapters.fasta"),
            "-t", "-g", "3", "--backend", "numpy"]
    env = dict(os.environ, C3POA_PROGRESS="0")

    clean = str(tmp_path / "clean")
    subprocess.run(base + ["-o", clean], check=True, env=env, timeout=900)
    out = str(tmp_path / "supervised")
    r = subprocess.run(base + ["-o", out, "--rss-restart-mb", "1"],
                       env=env, timeout=900, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "restart(s)" in r.stderr
    t1, t2 = _tree(clean), _tree(out)
    assert set(t1) == set(t2)
    for rel in t1:
        assert t1[rel] == t2[rel], f"{rel} differs"
