#!/usr/bin/env python3
"""One warm + one measured pipeline run that KEEPS c3poa_stats.json and
prints the per-stage seconds, launch counts, and padding ratios — the
numbers that say where the next throughput x comes from.

Usage: python tools/stage_profile.py [n_reads=2048] [out=/tmp/c3poa_prof]
"""

import json
import os
import sys

sys.path.insert(0, ".")

from bench import make_dataset, run_once, wait_for_accelerator  # noqa: E402


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/c3poa_prof"
    wait_for_accelerator()
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    backend = TpuBackend()
    os.makedirs(out_root, exist_ok=True)
    make_dataset(out_root, n_reads)
    gs = min(512, max(1, n_reads // 2))
    run_once(out_root, os.path.join(out_root, "warm"), backend,
             group_size=gs)
    stats, dt = run_once(out_root, os.path.join(out_root, "out"), backend,
                         group_size=gs)
    sp = json.load(open(os.path.join(out_root, "out", "c3poa_stats.json")))
    reads_s = stats.total_reads / dt
    n_groups = max(1, n_reads // gs)
    print(f"reads/s: {reads_s:.1f}  wall: {dt:.2f}s  groups: {n_groups}")
    stages = sp.get("stages_s", {})
    for k in sorted(stages, key=lambda k: -stages[k]):
        print(f"  stage {k:>12}: {stages[k]:7.2f} s "
              f"({stages[k] / n_groups:.3f} s/group)")
    c = sp.get("counters", {})
    for k in sorted(c):
        print(f"  counter {k:>28}: {c[k]}")
    if c.get("locate_cells_real"):
        print(f"  locate pad ratio: "
              f"{c['locate_cells_padded'] / c['locate_cells_real']:.2f}")


if __name__ == "__main__":
    main()
