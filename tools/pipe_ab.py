#!/usr/bin/env python3
"""End-to-end interleaved A/B: C3POA_ALIGN_PIPE=1 vs =2 (dual DP states).

Ship decisions on this box must come from alternating full-pipeline runs
inside ONE process (ARCHITECTURE.md measurement rules: program-level
variance through the relay is +-30-80% across processes, and p_tile=64
won isolated but lost in-pipeline).  The env var is read per align call
and nh is a static jit arg, so both variants stay compiled and warm
while the arms alternate.

Usage: python tools/pipe_ab.py [n_reads=2048] [rounds=3]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from bench import make_dataset, run_once  # noqa: E402


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    backend = TpuBackend()
    with tempfile.TemporaryDirectory() as d:
        make_dataset(d, n_reads)
        gs = min(512, max(1, n_reads // 2))
        times = {"1": [], "2": []}
        # warm both arms (each compiles its own nh-static kernels)
        for arm in ("1", "2"):
            os.environ["C3POA_ALIGN_PIPE"] = arm
            run_once(d, os.path.join(d, f"warm{arm}"), backend,
                     group_size=gs)
        for r in range(rounds):
            for arm in ("1", "2"):
                os.environ["C3POA_ALIGN_PIPE"] = arm
                stats, dt = run_once(
                    d, os.path.join(d, f"o{arm}_{r}"), backend,
                    group_size=gs)
                rs = stats.total_reads / dt
                times[arm].append(rs)
                print(f"round {r} nh={arm}: {rs:7.1f} reads/s", flush=True)
        med = {a: sorted(v)[len(v) // 2] for a, v in times.items()}
        print(f"median nh=1 {med['1']:.1f} r/s, nh=2 {med['2']:.1f} r/s, "
              f"ratio {med['2'] / med['1']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
