#!/usr/bin/env python3
"""Sequential interleaved A/Bs of several env toggles in ONE process.

Each arm alternates with the shared base configuration inside the same
process (ARCHITECTURE.md measurement rules: cross-process variance on the
relayed runtime swamps single-digit effects; relay-side program loads
cost ~30-75s per shape per process, so sharing one process amortizes
them across every A/B).  Prints a per-arm median ratio table.

Usage:
    python tools/pipe_ab_multi.py [n_reads=2048] [rounds=3] \
        [ARM1 ARM2 ...]

Arms use pipe_ab syntax: "VAR=val" or "VAR1+VAR2=v1+v2"; group size
arms use the pseudo-var "GS=n".
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from bench import make_dataset, run_once  # noqa: E402

DEFAULT_ARMS = (
    "C3POA_FAST_BAND=64",
    "C3POA_LOCATE_BUCKETS=16384,32768",
    "C3POA_P_LADDER_MAX=4096",
    "C3POA_PACK_ALIGN=0",  # default flipped ON in r5: arm measures OFF
    "C3POA_ALIGN_PIPE=2",
    "C3POA_WALK_WIDE=1",
    "C3POA_ALIGN_EARLY=1",
)


def parse_arm(arm):
    var, val = arm.split("=", 1)
    return var.split("+"), val.split("+")


def set_env(names, vals):
    for name, val in zip(names, vals):
        if val == "":
            os.environ.pop(name, None)
        else:
            os.environ[name] = val


def clear_env(names):
    for name in names:
        os.environ.pop(name, None)


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    arms = sys.argv[3:] or list(DEFAULT_ARMS)

    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    backend = TpuBackend()
    results = {}
    with tempfile.TemporaryDirectory() as d:
        make_dataset(d, n_reads)
        gs0 = min(512, max(1, n_reads // 2))

        def run(tag, gs):
            t0 = time.time()
            stats, dt = run_once(d, os.path.join(d, tag), backend,
                                 group_size=gs)
            rs = stats.total_reads / dt
            return rs, time.time() - t0

        # base warm (also warms every arm that shares base shapes)
        rs, wt = run("warmbase", gs0)
        print(f"warm base: {wt:.1f}s ({rs:.1f} r/s)", flush=True)

        for arm in arms:
            names, vals = parse_arm(arm)
            gs_arm = gs0
            env_names = [n for n in names if n != "GS"]
            env_vals = [v for n, v in zip(names, vals) if n != "GS"]
            for n_, v_ in zip(names, vals):
                if n_ == "GS":
                    gs_arm = int(v_)
            set_env(env_names, env_vals)
            rs, wt = run(f"warm_{arm.replace('/', '_')[:40]}", gs_arm)
            print(f"warm {arm}: {wt:.1f}s ({rs:.1f} r/s)", flush=True)
            base_rs, arm_rs = [], []
            for r in range(rounds):
                clear_env(env_names)
                rs_b, _ = run(f"b{len(results)}_{r}", gs0)
                base_rs.append(rs_b)
                set_env(env_names, env_vals)
                rs_a, _ = run(f"a{len(results)}_{r}", gs_arm)
                arm_rs.append(rs_a)
                print(f"  round {r}: base {rs_b:7.1f}  {arm} {rs_a:7.1f}"
                      f"  ({rs_a / rs_b:.3f}x)", flush=True)
            clear_env(env_names)
            mb = sorted(base_rs)[len(base_rs) // 2]
            ma = sorted(arm_rs)[len(arm_rs) // 2]
            results[arm] = (mb, ma)
            print(f"ARM {arm}: base {mb:.1f} vs arm {ma:.1f}"
                  f" -> {ma / mb:.3f}x", flush=True)

    print("\n=== summary (medians, interleaved vs base) ===")
    for arm, (mb, ma) in results.items():
        print(f"{arm:50s} {ma / mb:.3f}x  ({mb:.1f} -> {ma:.1f} r/s)")


if __name__ == "__main__":
    main()
