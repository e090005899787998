#!/usr/bin/env python3
"""Simulated mesh scaling curve (round-4 verdict item 8).

Runs the full pipeline over a virtual n-device CPU mesh for n in
{1, 2, 4, 8} (one subprocess per n — the forced host-platform device
count is fixed at JAX init) and reports reads/s plus the HOST-stage
share of wall time per mesh size.  Virtual CPU devices share the same
cores, so the reads/s column is NOT a chip-scaling number; the point is
the host columns: the stages that do NOT shrink as the device batch
splits n ways are the Amdahl term that caps the north-star
multi-chip arithmetic (BENCHMARKS.md).  Host-projected scaling =
wall(1) / (host_serial + device_share / n).

Usage: python tools/mesh_scaling.py [n_reads=256] [mode=cpu|tpu]
  mode=tpu runs mesh=None vs a 1-device Mesh on the real chip instead
  (shard_map overhead check).
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, ".")
n_dev = int(sys.argv[1])
n_reads = int(sys.argv[2])
use_mesh = sys.argv[3] == "1"
from bench import make_dataset
from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline
from c3poa_tpu.pipeline.tpu_backend import TpuBackend
import jax
mesh = None
if use_mesh:
    from c3poa_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_dev)
backend = TpuBackend(mesh=mesh)
gs = max(1, n_reads // 2)
with tempfile.TemporaryDirectory() as d:
    make_dataset(d, n_reads)
    run_pipeline(os.path.join(d, "reads.fastq"),
                 os.path.join(d, "splint.fasta"), os.path.join(d, "warm"),
                 PipelineConfig(group_size=gs), backend)
    t0 = time.time()
    st = run_pipeline(os.path.join(d, "reads.fastq"),
                      os.path.join(d, "splint.fasta"), os.path.join(d, "o"),
                      PipelineConfig(group_size=gs), backend)
    wall = time.time() - t0
    sp = json.load(open(os.path.join(d, "o", "c3poa_stats.json")))
    print("RESULT " + json.dumps({
        "n_dev": n_dev, "reads_s": st.total_reads / wall, "wall": wall,
        "stages": sp.get("stages_s", {})}))
"""

# stages that run on the HOST regardless of mesh size (do not shrink as
# the device batch splits): the Amdahl term
HOST_STAGES = ("segment", "pairs_build", "vote", "write", "embed",
               "align_host_records", "zero_prep", "zero_repeat",
               "poa_fallback")


def run_n(n_dev, n_reads, mode):
    env = dict(os.environ)
    if mode == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={n_dev}")
    r = subprocess.run([sys.executable, "-c", WORKER,
                        str(n_dev), str(n_reads),
                        "1" if (n_dev > 1 or mode == "tpu_mesh") else "0"],
                       capture_output=True, text=True, env=env,
                       timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    print(r.stdout[-2000:], file=sys.stderr)
    print(r.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"worker n={n_dev} failed")


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "cpu"
    rows = []
    if mode == "tpu":
        rows.append(("jit", run_n(1, n_reads, "tpu")))
        rows.append(("mesh1", run_n(1, n_reads, "tpu_mesh")))
    else:
        for n in (1, 2, 4, 8):
            rows.append((str(n), run_n(n, n_reads, "cpu")))
            print(f"# n={n} done", file=sys.stderr, flush=True)
    print(f"{'mesh':>6} {'reads/s':>8} {'wall_s':>7} {'host_s':>7} "
          f"{'host_share':>10}")
    for tag, r in rows:
        host = sum(r["stages"].get(k, 0.0) for k in HOST_STAGES)
        share = host / max(r["wall"], 1e-9)
        print(f"{tag:>6} {r['reads_s']:8.1f} {r['wall']:7.1f} "
              f"{host:7.2f} {share:10.2%}")
    # host-projected chip scaling from the n=1 row
    if mode == "cpu" and rows:
        r1 = rows[0][1]
        host = sum(r1["stages"].get(k, 0.0) for k in HOST_STAGES)
        dev = max(r1["wall"] - host, 0.0)
        print("\n# Amdahl projection from mesh=1 stage split "
              "(host fixed, device / n):")
        for n in (1, 2, 4, 8, 16):
            proj = r1["wall"] / (host + dev / n)
            print(f"#  n={n:<3} projected speedup {proj:.2f}x")


if __name__ == "__main__":
    main()
