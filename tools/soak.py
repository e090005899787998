#!/usr/bin/env python3
"""1M-read streaming soak (SURVEY.md §5 config-5 envelope on one chip).

Generates a production-shaped R2C2 fastq with a VECTORIZED simulator
(the per-char sim.mutate would take hours at this scale), then runs the
full pipeline while sampling RSS and compile counters.  Pass criteria:
flat RSS, zero steady-state recompiles, sustained reads/s.

    python tools/soak.py [--reads 1000000] [--out SOAK.json]
                         [--dir /tmp/c3poa_soak] [--resume-test]

--resume-test: SIGKILLs the pipeline subprocess mid-soak and resumes it,
asserting the final consensus count matches an uninterrupted accounting
(byte-parity of resume is covered by tests; the soak checks it at
scale).  The dataset is cached in --dir keyed by (reads, seed), so
reruns skip generation.
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

import numpy as np  # noqa: E402

LUT = np.frombuffer(b"ACGTN", dtype=np.uint8)


def mutate_fast(rng, codes, sub, ins, dele):
    """Vectorized sub/ins/del channel (same rates as sim.mutate; inserts
    follow emitted bases with geometric counts)."""
    n = len(codes)
    r = rng.random(n)
    keep = r >= dele
    out_codes = codes.copy()
    submask = keep & (r < dele + sub)
    out_codes[submask] = rng.integers(0, 4, int(submask.sum()))
    counts = (rng.geometric(1.0 - ins, size=n) - 1).astype(np.int64)
    counts[~keep] = 0
    contrib = keep.astype(np.int64) + counts
    ends = np.cumsum(contrib)
    total = int(ends[-1]) if n else 0
    out = rng.integers(0, 4, total).astype(np.int8)  # prefill = inserts
    starts = ends - contrib
    out[starts[keep]] = out_codes[keep]
    return out


def generate(path, n_reads, seed=0, insert_len=(500, 2000), copies=(5, 15),
             error=0.05, chunk=2000):
    """Write reads.fastq + splint.fasta under path (cached by meta)."""
    os.makedirs(path, exist_ok=True)
    meta_p = os.path.join(path, "meta.json")
    meta = {"n": n_reads, "seed": seed, "insert_len": insert_len,
            "copies": copies, "error": error, "v": 2}
    if os.path.exists(meta_p):
        try:
            if json.load(open(meta_p)) == json.loads(json.dumps(meta)):
                print(f"# dataset cached in {path}", file=sys.stderr)
                return
        except (OSError, ValueError):
            pass
    rng = np.random.default_rng(seed)
    splint = rng.integers(0, 4, 200).astype(np.int8)
    with open(os.path.join(path, "splint.fasta"), "w") as fh:
        fh.write(">Splint1\n" + LUT[splint].tobytes().decode() + "\n")
    sub, ins, dele = error * 0.5, error * 0.25, error * 0.25
    comp = np.array([3, 2, 1, 0, 4], dtype=np.int8)
    t0 = time.time()
    with open(os.path.join(path, "reads.fastq"), "w") as fh:
        for i in range(n_reads):
            il = int(rng.integers(insert_len[0], insert_len[1] + 1))
            nc = int(rng.integers(copies[0], copies[1] + 1))
            insert = rng.integers(0, 4, il).astype(np.int8)
            lead = insert[-il // 2:]
            trail = insert[:il // 2]
            parts = [lead]
            for _ in range(nc):
                parts.append(splint)
                parts.append(insert)
            parts.append(splint)
            parts.append(trail)
            clean = np.concatenate(parts)
            read = mutate_fast(rng, clean, sub, ins, dele)
            if rng.random() < 0.5:
                read = comp[read][::-1]
            seq = LUT[read].tobytes().decode()
            fh.write(f"@soak_{i}_{nc}\n{seq}\n+\n{'5' * len(seq)}\n")
            if i % 50000 == 0 and i:
                print(f"# generated {i}/{n_reads} "
                      f"({i / (time.time() - t0):.0f} reads/s)",
                      file=sys.stderr, flush=True)
    json.dump(meta, open(meta_p, "w"))


def rss_mb(pid):
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
    except OSError:
        return None
    return None


def rss_tree_mb(root_pid):
    """Max VmRSS over root_pid and its descendants (under
    --rss-restart-mb the CLI is a small supervisor whose worker child
    holds the memory)."""
    best = rss_mb(root_pid)
    try:
        pids = [int(p) for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return best
    parent = {}
    for p in pids:
        try:
            with open(f"/proc/{p}/stat") as fh:
                parent[p] = int(fh.read().split()[3])
        except (OSError, ValueError, IndexError):
            pass
    tree = {root_pid}
    grew = True
    while grew:
        grew = False
        for p, pp in parent.items():
            if pp in tree and p not in tree:
                tree.add(p)
                grew = True
    for p in tree:
        m = rss_mb(p)
        if m is not None and (best is None or m > best):
            best = m
    return best


def run_soak(d, out, resume_test=False, kill_after_s=300,
             rss_restart_mb=0):
    env = dict(os.environ, C3POA_PROGRESS="1")
    cmd = [sys.executable, "-m", "c3poa_tpu.cli",
           "-r", os.path.join(d, "reads.fastq"),
           "-s", os.path.join(d, "splint.fasta"),
           "-o", out, "--backend", "tpu", "--resume"]
    if rss_restart_mb:
        cmd += ["--rss-restart-mb", str(rss_restart_mb)]
    samples = []
    t0 = time.time()
    kills = 0

    def sample_loop(pid, stop):
        while not stop.is_set():
            m = rss_tree_mb(pid)
            if m is not None:
                samples.append((round(time.time() - t0, 1), m))
            stop.wait(30)

    while True:
        # own session: the resume-test SIGKILL must take out the whole
        # tree (supervisor + worker), not orphan a still-writing worker
        proc = subprocess.Popen(cmd, env=env, start_new_session=True)
        stop = threading.Event()
        th = threading.Thread(target=sample_loop, args=(proc.pid, stop),
                              daemon=True)
        th.start()
        if resume_test and kills == 0:
            time.sleep(kill_after_s)
            if proc.poll() is None:
                import signal
                os.killpg(proc.pid, signal.SIGKILL)
                kills += 1
                proc.wait()
                stop.set()
                print("# SIGKILLed mid-soak; resuming", file=sys.stderr)
                continue
        rc = proc.wait()
        stop.set()
        if rc != 0:
            raise SystemExit(f"pipeline exited {rc}")
        break
    return time.time() - t0, samples, kills


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1000000)
    ap.add_argument("--dir", default="/tmp/c3poa_soak")
    ap.add_argument("--out", default="SOAK.json")
    ap.add_argument("--resume-test", action="store_true")
    ap.add_argument("--kill-after", type=int, default=300)
    ap.add_argument("--rss-restart-mb", type=int, default=0,
                    help="pass through to the CLI's restart supervisor "
                         "(bounds RSS against the relay's transfer leak, "
                         "tools/leak_probe.py)")
    args = ap.parse_args()

    generate(args.dir, args.reads)
    out_dir = os.path.join(args.dir, "out")
    wall, samples, kills = run_soak(args.dir, out_dir,
                                    resume_test=args.resume_test,
                                    kill_after_s=args.kill_after,
                                    rss_restart_mb=args.rss_restart_mb)
    stats = {}
    sp = os.path.join(out_dir, "c3poa_stats.json")
    if os.path.exists(sp):
        stats = json.load(open(sp))
    n_cons = 0
    log_p = os.path.join(out_dir, "c3poa.log")
    cons = os.path.join(out_dir, "Splint1", "R2C2_Consensus.fasta")
    if os.path.exists(cons):
        with open(cons, "rb") as fh:
            n_cons = sum(1 for line in fh if line.startswith(b">"))
    rss_vals = [m for _, m in samples]
    result = {
        "reads": args.reads,
        "wall_s": round(wall, 1),
        "reads_per_sec": round(args.reads / wall, 2),
        "consensi": n_cons,
        "rss_mb_min": min(rss_vals, default=None),
        "rss_mb_max": max(rss_vals, default=None),
        "rss_samples": samples[:: max(1, len(samples) // 50)],
        "sigkills": kills,
        "compiled_shapes": {k: v for k, v in
                            stats.get("counters", {}).items()
                            if "compiled" in k},
        "log_exists": os.path.exists(log_p),
    }
    json.dump(result, open(args.out, "w"), indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "rss_samples"}))


if __name__ == "__main__":
    main()
