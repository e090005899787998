#!/usr/bin/env python3
"""Honest on-chip microbenchmarks: XLA-scan vs Pallas kernels.

Measurement rules for this box's relayed TPU (ARCHITECTURE.md): fresh
input buffers per repetition, outputs materialized with np.asarray
(block_until_ready does not block through the relay), small reductions
materialized instead of big blocks (device->host link is ~40-100 MB/s).

Usage: python tools/kernel_bench.py [locate|align|all] [--sizes ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _time(fn, make_args, reps=3):
    """Best-of-reps wall time with fresh buffers, materialized outputs."""
    best = float("inf")
    for _ in range(reps):
        args = make_args()
        t0 = time.perf_counter()
        out = fn(*args)
        if isinstance(out, tuple):
            for o in out:
                np.asarray(o)
        else:
            np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_profile(shapes=((64, 8192), (512, 8192), (512, 32768))):
    import jax
    import jax.numpy as jnp

    from c3poa_tpu.kernels.pallas_profile import start_profile_pallas
    from c3poa_tpu.kernels.sw_profile import start_profile_batch

    rng = np.random.default_rng(0)
    m = 288
    C = 2
    splints = rng.integers(0, 4, size=(C, m)).astype(np.int8)

    xla_red = jax.jit(lambda r, s: jnp.max(start_profile_batch(r, s), axis=2))
    pal_red = jax.jit(lambda r, s: jnp.max(start_profile_pallas(r, s), axis=2))

    for B, L in shapes:
        cells = B * C * L * m

        def mk():
            return (rng.integers(0, 4, size=(B, L)).astype(np.int8), splints)

        # warm both (compiles)
        np.asarray(xla_red(*mk()))
        np.asarray(pal_red(*mk()))
        t_x = _time(xla_red, mk)
        t_p = _time(pal_red, mk)
        print(f"profile B={B} L={L} C={C} m={m}: "
              f"xla {t_x * 1e3:7.1f} ms ({cells / t_x / 1e9:6.2f} G cells/s)  "
              f"pallas {t_p * 1e3:7.1f} ms ({cells / t_p / 1e9:6.2f} G c/s)  "
              f"speedup {t_x / t_p:4.1f}x", flush=True)


def bench_align(shapes=((512, 2048, 128), (2048, 2048, 128))):
    """XLA scan vs the SHIPPED Pallas config (p_tile=32, packed move
    words — tpu_backend._align_trace_impl); full-length and ragged
    (length-sorted ql in [nq/3, nq], the pipeline's packing shape)."""
    import jax
    import jax.numpy as jnp

    from c3poa_tpu.kernels.banded import banded_align_batch
    from c3poa_tpu.kernels.pallas_banded import banded_fwd_pallas_packed

    rng = np.random.default_rng(1)

    def xla_fn(q, t, ql, tl):
        s, j, mv = banded_align_batch(q, t, ql, tl, band=W_CUR)
        return s, j, jnp.max(mv)  # moves stay on device

    def pal_fn(q, t, ql, tl):
        s, j, mv = banded_fwd_pallas_packed(q, t, ql, tl, band=W_CUR,
                                            p_tile=32)
        return s, j, jnp.max(mv)

    for P, nq, W in shapes:
        global W_CUR
        W_CUR = W
        nt = nq

        def mk(ragged=False):
            q = rng.integers(0, 4, size=(P, nq)).astype(np.int8)
            t = q.copy()
            if ragged:
                ql = np.sort(rng.integers(nq // 3, nq + 1, P)
                             .astype(np.int32))[::-1].copy()
            else:
                ql = np.full(P, nq, dtype=np.int32)
            return q, t, ql, ql.copy()

        xj = jax.jit(xla_fn)
        pj = jax.jit(pal_fn)
        a = mk()
        sx = [np.asarray(v) for v in xj(*a)]
        sp = [np.asarray(v) for v in pj(*a)]
        assert np.array_equal(sx[0], sp[0]), "score mismatch"
        for tag, ragged in (("full", False), ("ragged", True)):
            cells = int(mk(ragged)[2].astype(np.int64).sum()) * W
            t_x = _time(xj, lambda: mk(ragged))
            t_p = _time(pj, lambda: mk(ragged))
            print(f"align P={P} nq={nq} W={W} {tag}: "
                  f"xla {t_x * 1e3:7.1f} ms ({cells / t_x / 1e9:6.2f}"
                  f" G real c/s)  pallas {t_p * 1e3:7.1f} ms "
                  f"({cells / t_p / 1e9:6.2f} G c/s)  "
                  f"speedup {t_x / t_p:4.1f}x", flush=True)


def bench_align_pipe(shapes=((512, 2048, 128), (2048, 2048, 128)),
                     p_tiles=(32, 64), reps=7):
    """Interleaved A/B of nh=1 vs nh=2 (software-pipelined dual DP
    states, C3POA_ALIGN_PIPE).  Per-arm calls alternate within one
    process — the only trustworthy comparison on this box (program-level
    variance through the relay is +-30-80% across processes)."""
    import jax
    import jax.numpy as jnp

    from c3poa_tpu.kernels.pallas_banded import banded_fwd_pallas_packed

    rng = np.random.default_rng(1)
    for P, nq, W in shapes:
        nt = nq

        def mk():
            q = rng.integers(0, 4, size=(P, nq)).astype(np.int8)
            ql = np.sort(rng.integers(nq // 3, nq + 1, P)
                         .astype(np.int32))[::-1].copy()
            return q, q.copy(), ql, ql.copy()

        for pt in p_tiles:
            arms = {}
            for nh in (1, 2):
                arms[nh] = jax.jit(lambda q, t, ql, tl, nh=nh, pt=pt: (
                    lambda s, j, mv: (s, j, jnp.max(mv)))(
                    *banded_fwd_pallas_packed(q, t, ql, tl, band=W,
                                              p_tile=pt, nh=nh)))
            a = mk()
            outs = {nh: [np.asarray(v) for v in fn(*a)]
                    for nh, fn in arms.items()}
            assert np.array_equal(outs[1][0], outs[2][0]), "score mismatch"
            times = {1: [], 2: []}
            for _ in range(reps):
                for nh in (1, 2):
                    args = mk()
                    t0 = time.perf_counter()
                    for o in arms[nh](*args):
                        np.asarray(o)
                    times[nh].append(time.perf_counter() - t0)
            med = {nh: sorted(ts)[len(ts) // 2] for nh, ts in times.items()}
            cells = int(mk()[2].astype(np.int64).sum()) * W
            print(f"align-pipe P={P} nq={nq} W={W} p_tile={pt}: "
                  f"nh=1 {med[1] * 1e3:7.1f} ms ({cells / med[1] / 1e9:5.2f}"
                  f" G c/s)  nh=2 {med[2] * 1e3:7.1f} ms "
                  f"({cells / med[2] / 1e9:5.2f} G c/s)  "
                  f"speedup {med[1] / med[2]:5.2f}x", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if what in ("profile", "all", "locate"):
        bench_profile()
    if what in ("align", "all"):
        bench_align()
    if what == "pipe":
        bench_align_pipe()
