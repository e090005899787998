#!/usr/bin/env python3
"""Interleaved launch-level sweep of align-forward configs.

Sweeps (p_tile, superblock/fold, vmem_mb) on the banded forward at the
bench shape, alternating configs within one process (the only
trustworthy comparison through this box's relay).  Each config's scores
are asserted equal to the baseline config's — bit-parity while timing.

Usage: python tools/align_sweep.py [P=2048] [nq=2048] [reps=5]
       [configs=pt32;pt64;pt128v64;pt64f_v64...]

Config grammar: pt<P_TILE>[s|f][v<VMEM_MB>]  (s=superblock, f=fold).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def parse_cfg(s):
    """pt<P_TILE>[s|f][e][v<VMEM_MB>]: s=superblock, f=fold(+sb),
    e=early prefix-max exit."""
    assert s.startswith("pt")
    rest = s[2:]
    vmem = 0
    if "v" in rest:
        rest, v = rest.split("v", 1)
        vmem = int(v)
    sb = fold = early = False
    while rest and rest[-1] in "sfe":
        c, rest = rest[-1], rest[:-1]
        if c == "s":
            sb = True
        elif c == "f":
            fold = sb = True
        else:
            early = True
    return dict(p_tile=int(rest), superblock=sb, fold=fold, vmem_mb=vmem,
                early=early)


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cfgs = (sys.argv[4].split(";") if len(sys.argv) > 4 else
            ["pt32", "pt64", "pt64v64", "pt128v64", "pt48f", "pt64fv64",
             "pt128fv64"])

    import jax
    import jax.numpy as jnp

    from c3poa_tpu.kernels.pallas_banded import banded_fwd_pallas_packed

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    W = 128

    def mk():
        q = rng.integers(0, 4, size=(P, nq)).astype(np.int8)
        ql = np.sort(rng.integers(nq // 3, nq + 1, P)
                     .astype(np.int32))[::-1].copy()
        return q, q.copy(), ql, ql.copy()

    fns = {}
    for c in cfgs:
        if c in ("t", "te"):
            # the transposed (band-on-sublanes) forward was deleted in
            # round 5 after losing its A/B (0.57x, BENCHMARKS.md kernel
            # table — register spill at (128, 128)-per-operand tiles)
            print(f"{c}: transposed kernel removed (r4 A/B 0.57x); "
                  f"see BENCHMARKS.md", flush=True)
            continue
        kw = parse_cfg(c)
        fns[c] = jax.jit(lambda q, t, ql, tl, kw=kw: (
            lambda s, j, mv: (s, j, jnp.max(mv)))(
            *banded_fwd_pallas_packed(q, t, ql, tl, band=W, **kw)))

    # warm + parity check against the first config
    a = mk()
    ref = None
    ok_cfgs = []
    for c in cfgs:
        try:
            out = [np.asarray(v) for v in fns[c](*a)]
        except Exception as exc:
            msg = str(exc).replace("\n", " ")[:140]
            print(f"{c}: COMPILE/RUN FAILED: {msg}", flush=True)
            continue
        if ref is None:
            ref = out
        else:
            assert np.array_equal(ref[0], out[0]), f"{c}: score mismatch"
            assert np.array_equal(ref[1], out[1]), f"{c}: j_end mismatch"
        ok_cfgs.append(c)

    times = {c: [] for c in ok_cfgs}
    for _ in range(reps):
        for c in ok_cfgs:
            args = mk()
            t0 = time.perf_counter()
            for o in fns[c](*args):
                np.asarray(o)
            times[c].append(time.perf_counter() - t0)
    cells = int(mk()[2].astype(np.int64).sum()) * W
    base = None
    for c in ok_cfgs:
        med = sorted(times[c])[len(times[c]) // 2]
        if base is None:
            base = med
        print(f"{c:>12}: {med * 1e3:7.1f} ms  {cells / med / 1e9:5.2f} G c/s"
              f"  {base / med:5.2f}x  (all: "
              + " ".join(f"{t * 1e3:.0f}" for t in sorted(times[c])) + ")",
              flush=True)


if __name__ == "__main__":
    main()
