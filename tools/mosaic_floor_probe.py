#!/usr/bin/env python3
"""Minimal repro: per-op issue cost of Mosaic vector ops on this TPU.

The align forward's cost model (BENCHMARKS.md) says time ~ ops_on_the
_serial_chain x per-op-cost(tile_count), with a large fixed per-op
component.  This probe isolates that floor with the smallest possible
kernel: a fori_loop whose body is M unrolled elementwise ops on a
(S, 128) int32 VMEM register, varying

- S (sublanes; S/8 native (8,128) tiles per op): per-op throughput term
- dependency: 'chain' = every op consumes the previous op's result;
  'indep2/4' = 2/4 interleaved independent chains (same op count) —
  if the hardware/compiler overlapped dependent-op latency, indep would
  be measurably faster per op; measured equality means ops are
  ISSUE-bound (in-order issue cost), not latency-bound.

Usage: python tools/mosaic_floor_probe.py [M=64] [NITER=4096]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(S, M, NITER, lanes, mode):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch = {"chain": 1, "indep2": 2, "indep4": 4}[mode]
    assert M % (2 * nch) == 0

    def kernel(x_ref, o_ref):
        c = x_ref[:]

        def body(i, xs):
            xs = list(xs)
            # M total ops, round-robin over nch independent chains;
            # alternate add/max so nothing folds algebraically
            for k in range(M // (2 * nch)):
                for h in range(nch):
                    xs[h] = xs[h] + c
                    xs[h] = jnp.maximum(xs[h], c - xs[h])
            return tuple(xs)

        xs = tuple(c + h for h in range(nch))
        xs = jax.lax.fori_loop(0, NITER, body, xs)
        acc = xs[0]
        for h in range(1, nch):
            acc = jnp.maximum(acc, xs[h])
        o_ref[:] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, lanes), jnp.int32),
        )(x)

    return run


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    NITER = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    import jax
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    lanes = 128
    rng = np.random.default_rng(0)
    print(f"{'S':>4} {'tiles':>5} {'mode':>7} {'ms':>8} {'ns/op':>7} "
          f"{'ns/op/tile':>10}")
    for S in (8, 32, 64, 128, 256):
        for mode in ("chain", "indep2", "indep4"):
            fn = build(S, M, NITER, lanes, mode)

            def mk():
                return rng.integers(1, 7, size=(S, lanes)).astype(np.int32)

            np.asarray(fn(mk()))  # warm/compile
            best = float("inf")
            for _ in range(5):
                a = mk()
                t0 = time.perf_counter()
                np.asarray(fn(a))
                best = min(best, time.perf_counter() - t0)
            ops = M * NITER
            tiles = S // 8
            print(f"{S:>4} {tiles:>5} {mode:>7} {best * 1e3:>8.2f} "
                  f"{best / ops * 1e9:>7.2f} "
                  f"{best / ops / tiles * 1e9:>10.3f}", flush=True)


if __name__ == "__main__":
    main()
