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


def fitting_edit_distance(query: np.ndarray, target: np.ndarray) -> int:
    """Edit distance of ``query`` against its best-matching substring of
    ``target`` (ends free on the target — infix alignment).  Row-wise
    numpy DP; the in-row horizontal dependency is resolved exactly with a
    prefix-min scan (unit costs: min_k (tmp[k] + (j-k)) =
    cummin(tmp[k]-k) + j)."""
    m, n = len(query), len(target)
    if m == 0:
        return 0
    if n == 0:
        return m
    j = np.arange(n + 1, dtype=np.int32)
    row = np.zeros(n + 1, dtype=np.int32)       # D[0][j] = 0 (free start)
    for i in range(m):
        sub = (target != query[i]).astype(np.int32)
        tmp = np.empty(n + 1, dtype=np.int32)
        tmp[0] = row[0] + 1                     # vertical only at j=0
        np.minimum(row[:-1] + sub, row[1:] + 1, out=tmp[1:])  # diag, vert
        row = np.minimum.accumulate(tmp - j) + j              # horizontal
    return int(row.min())


def measure_qv(out_dir: str, reads, max_reads: int = 192) -> dict:
    """Consensus accuracy vs the simulator's ground truth, reported next
    to reads/s so a kernel change cannot silently trade accuracy for
    throughput (VERDICT r4 item 3).

    Each consensus is [splint 2nd half][insert][splint 1st half] on the
    read's strand; the truth INSERT is fit into it with an ends-free
    (infix) edit distance, min over strands, so splint flanks and the
    +-few-base peak-position jitter at the cut points do not count as
    consensus errors.  QV = -10*log10(total_edits / total_insert_bases).
    """
    import glob
    import math
    from c3poa_tpu.utils.seqs import encode, revcomp

    truth = {r.name: r.insert for r in reads}
    errs = bases = n_scored = 0
    for path in sorted(glob.glob(os.path.join(
            out_dir, "*", "R2C2_Consensus.fasta"))):
        with open(path) as fh:
            name = None
            for line in fh:
                if line.startswith(">"):
                    name = line[1:].rsplit("_", 4)[0]
                elif name is not None:
                    if n_scored >= max_reads:
                        break
                    ins = truth.get(name)
                    if ins is None:
                        continue
                    cons = encode(line.strip())
                    d = min(fitting_edit_distance(encode(ins), cons),
                            fitting_edit_distance(encode(revcomp(ins)),
                                                  cons))
                    errs += d
                    bases += len(ins)
                    n_scored += 1
                    name = None
    qv = 99.0 if errs == 0 else -10.0 * math.log10(errs / max(bases, 1))
    return {"qv": round(qv, 2), "qv_errors": errs, "qv_bases": bases,
            "qv_reads": n_scored}


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


def wait_for_accelerator() -> dict:
    """The relayed TPU on this box can be DOWN, in which case jax device
    init hangs forever instead of erroring.  Probe it in a subprocess
    under a timeout (import + devices + one materialized computation),
    retrying up to BENCH_RELAY_WAIT seconds, so the bench either runs on
    a live chip or fails fast with a clear message — never hangs the
    driver.  A cpu-platform probe result (no accelerator configured at
    all) passes through: the bench then measures the jax CPU backend.

    Returns relay-health telemetry: {"probe_s": seconds the successful
    probe took, "probe_retries": failed attempts before it} — recorded
    in the bench output so a reader can tell a degraded-relay number
    from a real regression (round-3 lesson: BENCH_r03 recorded a
    sick-relay 288 r/s with nothing in the artifact saying so)."""
    import subprocess
    # observed relay outages run 3-15+ minutes (round-4 log); waiting up
    # to an hour beats recording a dead-relay failure as the round's
    # official number
    deadline = time.time() + float(os.environ.get("BENCH_RELAY_WAIT",
                                                  "3600"))
    probe = ("import jax; d = jax.devices(); "
             "jax.numpy.ones(8).sum().item(); "
             "print('PLATFORM=' + d[0].platform)")
    retries = 0
    while True:
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=120, text=True)
            if r.returncode == 0 and "PLATFORM=" in r.stdout:
                plat = r.stdout.rsplit("PLATFORM=", 1)[1].strip()
                probe_s = time.time() - t0
                print(f"# accelerator probe ok: {plat} "
                      f"({probe_s:.1f}s, {retries} retries)",
                      file=sys.stderr)
                return {"probe_s": round(probe_s, 2),
                        "probe_retries": retries}
            err = (r.stderr or "").strip().splitlines()
            msg = err[-1] if err else f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            msg = "device init timed out (relay down?)"
        retries += 1
        if time.time() > deadline:
            raise RuntimeError(
                f"accelerator unreachable after BENCH_RELAY_WAIT: {msg}")
        print(f"# accelerator probe failed ({msg}); retrying in 30s",
              file=sys.stderr)
        time.sleep(30)


def main():
    # 4096 reads in eight 512-read groups: the 3-stage pipeline (locate
    # g+2 / align g+1 / finalize g) reaches steady state from group 3,
    # so 8 groups dilute the pipeline fill to ~1 group of drag — closer
    # to the steady state long production runs spend all their time in
    # (the 1M-read soak sustained within ~5% of this shape's number)
    n_reads = int(os.environ.get("BENCH_READS", "4096"))
    relay = wait_for_accelerator()

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
        # minutes the first time, seconds after).  Cache telemetry: the
        # persistent jax compile cache's file count before/after plus the
        # per-stage compiled-shape counters, so a reader can tell local
        # cache misses (files grew) from relay-side compile cost (files
        # unchanged but warmup still slow) — VERDICT r4 item 6.
        sim_reads = make_dataset(d, n_reads)
        gs = min(512, max(1, n_reads // 2))
        jax_cache = os.environ.get(
            "C3POA_JAX_CACHE", os.path.expanduser("~/.cache/c3poa_jax"))

        def cache_files():
            try:
                return len(os.listdir(jax_cache))
            except OSError:
                return -1

        cache_before = cache_files()
        t_w0 = time.time()
        run_once(d, os.path.join(d, "warm"), backend, group_size=gs)
        warmup_s = time.time() - t_w0
        warm_shapes = {}
        try:
            wst = json.load(open(os.path.join(d, "warm",
                                              "c3poa_stats.json")))
            warm_shapes = {k: v for k, v in wst.get("counters", {}).items()
                           if k.endswith("compiled_shapes")}
        except (OSError, ValueError):
            pass
        warmup_info = {"cache_files_before": cache_before,
                       "cache_files_after": cache_files(),
                       "compiled_shapes": warm_shapes}

        # measured passes (fresh output dirs, identical input).  The
        # relayed runtime has 20-30% run-to-run variance on identical
        # code (round-5 same-day spot checks: 244-326 r/s on one
        # binary), so: the MEDIAN of 5 passes is the headline, every
        # pass is recorded, and a DEGRADED relay (probe retries fired,
        # or pass spread beyond 1.35x — the old 1.6x gate slept through
        # observed 1.33x sick-relay spreads) triggers a backoff + up to
        # 2 extra passes rather than silently recording a sick-relay
        # number (round-3 lesson).
        passes = []          # (reads/s, out_dir, stats)
        def one_pass(tag):
            st, dtp = run_once(d, os.path.join(d, tag), backend,
                               group_size=gs)
            rs = st.total_reads / dtp
            passes.append((rs, os.path.join(d, tag), st))
            print(f"# pass {tag}: {rs:.1f} reads/s ({dtp:.1f}s)",
                  file=sys.stderr)

        for rep in (1, 2, 3, 4, 5):
            one_pass(f"out{rep}")
        rates = [p[0] for p in passes]
        degraded = (relay["probe_retries"] > 0
                    or max(rates) / max(min(rates), 1e-9) > 1.35)
        if degraded:
            backoff = float(os.environ.get("BENCH_DEGRADED_BACKOFF", "60"))
            print(f"# relay degraded (retries={relay['probe_retries']}, "
                  f"spread={max(rates) / min(rates):.2f}x): backing off "
                  f"{backoff:.0f}s, then 2 extra passes", file=sys.stderr)
            time.sleep(backoff)
            for rep in (6, 7):
                one_pass(f"out{rep}")
            rates = [p[0] for p in passes]

        reads_s, best_out, stats = max(passes, key=lambda p: p[0])
        median_rs = sorted(rates)[len(rates) // 2]
        qv_info = measure_qv(best_out, sim_reads)

        baseline_32t = base["baseline_32t"]
        # the MEDIAN pass is the headline (VERDICT r4 item 4): the relayed
        # runtime's best pass flatters by up to ~10%; best is auxiliary
        result = {
            "metric": f"consensus_reads_per_sec_1chip_{name}",
            "value": round(median_rs, 3),
            "unit": "reads/s",
            "vs_baseline": round(median_rs / baseline_32t, 3),
            # context: a reader can tell a sick-relay artifact (high
            # probe_retries / wide pass spread) from a real regression
            "passes": [round(r, 1) for r in rates],
            "best": round(reads_s, 3),
            "best_vs_baseline": round(reads_s / baseline_32t, 3),
            "median": round(median_rs, 3),
            "median_vs_baseline": round(median_rs / baseline_32t, 3),
            **qv_info,
            "warmup_s": round(warmup_s, 1),
            "warmup": warmup_info,
            "relay": relay,
            "reads": n_reads,
        }
        print(json.dumps(result))
        print(f"# {stats.consensus_written}/{stats.total_reads} consensi "
              f"({name}); C-grade proxy baseline measured on "
              f"{base['reads']} reads, {base['cores']} cores: 1-thread "
              f"{base['t1_reads_per_sec']:.2f} r/s, -n 32 run "
              f"{base['t32_reads_per_sec']:.2f} r/s, baseline "
              f"{baseline_32t:.2f} r/s; old numpy-arm baseline "
              f"{base.get('baseline_numpy_32t', 0):.2f} r/s "
              f"(cache {BASELINE_CACHE})",
              file=sys.stderr)
        # per-stage steady-state profile of the best pass (stage seconds
        # overlap across the three pipeline threads; see BENCHMARKS.md)
        try:
            sp = json.load(open(os.path.join(
                best_out, "c3poa_stats.json")))
            n_groups = max(1, n_reads // gs)
            stages = sp.get("stages_s", {})
            line = "  ".join(
                f"{k}={stages[k] / n_groups:.3f}"
                for k in sorted(stages, key=lambda k: -stages[k]))
            print(f"# stage s/group (best pass): {line}", file=sys.stderr)
        except (OSError, ValueError):
            pass


if __name__ == "__main__":
    main()
