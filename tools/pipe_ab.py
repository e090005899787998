#!/usr/bin/env python3
"""End-to-end interleaved A/B of one align-path env toggle.

Ship decisions on this box must come from alternating full-pipeline runs
inside ONE process (ARCHITECTURE.md measurement rules: program-level
variance through the relay is +-30-80% across processes, and p_tile=64
won isolated but lost in-pipeline).  The toggles are read per align call
and map to static jit args, so both variants stay compiled and warm
while the arms alternate.

Usage:
    python tools/pipe_ab.py [n_reads=2048] [rounds=3] [VAR=a,b]

Default VAR is C3POA_ALIGN_PIPE=1,2 (the dual-DP-state software
pipeline).  The wide walk cache: C3POA_WALK_WIDE=0,1.

Multi-variable arms: join names and values with '+':
    VAR1+VAR2=a1+a2;b1+b2
e.g. "C3POA_ALIGN_PTILE+C3POA_ALIGN_VMEM_MB=64+0;128+64" alternates
(PTILE=64, no vmem raise) against (PTILE=128, 64 MB limit).
"""

import os
import sys
import tempfile
import time  # noqa: F401  (handy under -i)

sys.path.insert(0, ".")

from bench import make_dataset, run_once  # noqa: E402


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    var, arms = "C3POA_ALIGN_PIPE", ("1", "2")
    if len(sys.argv) > 3:
        var, vals = sys.argv[3].split("=", 1)
        # ";" separates arms when the values themselves hold commas
        arms = tuple(vals.split(";") if ";" in vals else vals.split(","))
    names = var.split("+")

    def set_arm(arm):
        for name, val in zip(names, arm.split("+")):
            if val == "":
                os.environ.pop(name, None)
            else:
                os.environ[name] = val
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    backend = TpuBackend()
    with tempfile.TemporaryDirectory() as d:
        make_dataset(d, n_reads)
        gs = min(512, max(1, n_reads // 2))
        times = {a: [] for a in arms}
        # warm both arms (each compiles its own static-arg kernels)
        for ai, arm in enumerate(arms):
            set_arm(arm)
            run_once(d, os.path.join(d, f"warm{ai}"), backend,
                     group_size=gs)
        for r in range(rounds):
            for ai, arm in enumerate(arms):
                set_arm(arm)
                stats, dt = run_once(
                    d, os.path.join(d, f"o{ai}_{r}"), backend,
                    group_size=gs)
                rs = stats.total_reads / dt
                times[arm].append(rs)
                print(f"round {r} {var}={arm}: {rs:7.1f} reads/s",
                      flush=True)
        med = {a: sorted(v)[len(v) // 2] for a, v in times.items()}
        base = med[arms[0]]
        for a in arms:
            print(f"median {var}={a}: {med[a]:.1f} r/s"
                  + ("" if a == arms[0] else
                     f"  ({med[a] / base:.3f}x vs {arms[0]})"),
                  flush=True)


if __name__ == "__main__":
    main()
