#!/usr/bin/env python3
"""One-command hardware gate (run before every round-end snapshot).

Runs, on the live accelerator:
1. env-toggle byte-parity (tools/hw_parity.py arms: the real Mosaic
   lowering of both variants of each shipped toggle must produce
   byte-identical output trees);
2. a smoke bench: median-of-N with IQR on a 512-read group pair —
   the relay's ±30-80% run-to-run variance makes single numbers
   meaningless, so the gate records spread, not a best-of;
3. dryrun_multichip(8) in a subprocess (virtual CPU mesh).

Writes ONE json (default HWCHECK.json at the repo root) and exits
nonzero if any section fails.

Usage:
    python tools/hwcheck.py [--reads 512] [--runs 5] [--out HWCHECK.json]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")

from bench import make_dataset, run_once, wait_for_accelerator  # noqa: E402


PARITY_TOGGLES = ["C3POA_WALK_WIDE=0,1", "C3POA_PROFILE_PHASED=0,1",
                  "C3POA_ALIGN_SB=0,1", "C3POA_ALIGN_FOLD=0,1",
                  "C3POA_PROFILE_TL=2048,4096",
                  "C3POA_PACK_UPLOAD=0,1", "C3POA_PACK_ALIGN=0,1",
                  "C3POA_FAST_BAND=0,64",
                  "C3POA_ALIGN_VMEM_MB=0,64",
                  "C3POA_ALIGN_PTILE=32,64"]


def run_parity(d, n_reads, backend, toggles):
    from hw_parity import tree_equal
    results = {}
    ok = True
    base_dir = os.path.join(d, "parity")
    os.makedirs(base_dir, exist_ok=True)
    make_dataset(base_dir, n_reads, seed=11)
    for t in toggles:
        var, vals = t.split("=", 1)
        arms = vals.split(";") if ";" in vals else vals.split(",")
        outs = []
        for arm in arms:
            os.environ[var] = arm
            out = os.path.join(base_dir, f"{var}_{arm}")
            run_once(base_dir, out, backend,
                     group_size=max(2, n_reads // 2))
            outs.append(out)
        os.environ.pop(var, None)
        bad = []
        for other in outs[1:]:
            bad += tree_equal(outs[0], other)
        results[t] = "ok" if not bad else f"FAIL: {bad[:5]}"
        ok = ok and not bad
        print(f"# parity {t}: {results[t]}", file=sys.stderr, flush=True)
    return results, ok


def run_smoke(d, n_reads, runs, backend):
    smoke_dir = os.path.join(d, "smoke")
    os.makedirs(smoke_dir, exist_ok=True)
    make_dataset(smoke_dir, n_reads, seed=12)
    gs = min(512, max(1, n_reads // 2))
    run_once(smoke_dir, os.path.join(smoke_dir, "warm"), backend,
             group_size=gs)
    rates = []
    for r in range(runs):
        stats, dt = run_once(smoke_dir, os.path.join(smoke_dir, f"o{r}"),
                             backend, group_size=gs)
        rates.append(stats.total_reads / dt)
        print(f"# smoke run {r}: {rates[-1]:.1f} r/s", file=sys.stderr,
              flush=True)
    rates_sorted = sorted(rates)
    n = len(rates_sorted)
    q1 = rates_sorted[max(0, n // 4)]
    q3 = rates_sorted[min(n - 1, (3 * n) // 4)]
    return {"reads": n_reads, "runs": [round(x, 2) for x in rates],
            "median": round(statistics.median(rates), 2),
            "iqr": [round(q1, 2), round(q3, 2)]}


def run_dryrun():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "__graft_entry__.py"), "8"],
            capture_output=True, text=True, timeout=1200)
        if r.returncode == 0:
            return "ok"
        tail = (r.stderr or r.stdout or "").strip().splitlines()
        return f"FAIL: {tail[-1] if tail else r.returncode}"
    except subprocess.TimeoutExpired:
        return "FAIL: timeout"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=512)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--parity_reads", type=int, default=256)
    ap.add_argument("--out", default="HWCHECK.json")
    ap.add_argument("--skip_parity", action="store_true")
    ap.add_argument("--skip_dryrun", action="store_true")
    args = ap.parse_args()

    wait_for_accelerator()
    import jax
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    backend = TpuBackend()

    import tempfile
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}
    ok = True
    with tempfile.TemporaryDirectory() as d:
        if not args.skip_parity:
            out["parity"], pok = run_parity(d, args.parity_reads, backend,
                                            PARITY_TOGGLES)
            ok = ok and pok
        out["smoke"] = run_smoke(d, args.reads, args.runs, backend)
    if not args.skip_dryrun:
        out["dryrun_multichip"] = run_dryrun()
        ok = ok and out["dryrun_multichip"] == "ok"
    out["ok"] = ok
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
