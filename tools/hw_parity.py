#!/usr/bin/env python3
"""Hardware byte-parity check for align/locate env toggles.

Runs the full pipeline on the live accelerator once per arm of each
given toggle and diffs the output trees byte-for-byte.  This is the
ship-gate the interpret-mode parity tests can't provide: it exercises
the real Mosaic lowering of both variants.

Usage:
    python tools/hw_parity.py [n_reads=256] [VAR=a,b ...]
"""

import filecmp
import os
import sys
import tempfile

sys.path.insert(0, ".")

from bench import make_dataset, run_once  # noqa: E402


IGNORE = {"c3poa_stats.json"}  # timing telemetry, legitimately differs


def tree_equal(a, b):
    bad = []
    for root, _, files in os.walk(a):
        for f in files:
            if f in IGNORE:
                continue
            pa = os.path.join(root, f)
            pb = os.path.join(b, os.path.relpath(pa, a))
            if not os.path.exists(pb) or not filecmp.cmp(pa, pb, shallow=False):
                bad.append(os.path.relpath(pa, a))
    na = sum(len([f for f in fs if f not in IGNORE])
             for _, _, fs in os.walk(a))
    nb = sum(len([f for f in fs if f not in IGNORE])
             for _, _, fs in os.walk(b))
    if na != nb:
        bad.append(f"file-count {na} vs {nb}")
    return bad


def main():
    args = sys.argv[1:]
    n_reads = 256
    if args and args[0].isdigit():
        n_reads = int(args.pop(0))
    toggles = args or ["C3POA_WALK_WIDE=0,1", "C3POA_PROFILE_PHASED=0,1",
                       "C3POA_ALIGN_PIPE=1,2"]
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    backend = TpuBackend()
    failures = 0
    with tempfile.TemporaryDirectory() as d:
        make_dataset(d, n_reads)
        for t in toggles:
            var, vals = t.split("=", 1)
            # ";" separates arms when the values themselves hold commas
            # (e.g. C3POA_LOCATE_BUCKETS=8192,32768;32768)
            arms = vals.split(";") if ";" in vals else vals.split(",")
            outs = []
            for arm in arms:
                os.environ[var] = arm
                out = os.path.join(d, f"{var}_{arm}")
                run_once(d, out, backend, group_size=max(2, n_reads // 2))
                outs.append(out)
            os.environ.pop(var, None)
            for other in outs[1:]:
                bad = tree_equal(outs[0], other)
                if bad:
                    failures += 1
                    print(f"PARITY FAIL {t}: {bad[:5]}", flush=True)
                else:
                    print(f"parity ok {t}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
