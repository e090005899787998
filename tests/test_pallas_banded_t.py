"""Transposed (band-on-sublanes) forward + walk: bit-parity vs the
XLA-scan spec in interpret mode.

The transposed kernel (kernels/pallas_banded_t.py) is the round-4
serial-depth experiment: it measured 0.57x on hardware (the forward is
VMEM-streaming-bound at fat tiles, not shift-latency-bound — see
BENCHMARKS.md), so it ships OFF (C3POA_ALIGN_T), but its parity is kept
honest here: the moves/walk contract must stay interchangeable with the
shipped kernel's."""

import numpy as np

from c3poa_tpu.kernels.banded import (
    banded_align_trace_batch, unpack_ops_packed,
)
from c3poa_tpu.kernels.pallas_banded_t import banded_align_trace_pallas_t


def test_transposed_trace_parity_interpret():
    rng = np.random.default_rng(7)
    # nq=64 with tl up to 160 exercises band advances s in {0..3}
    # (slope 2.5) while keeping interpret-mode runtime reasonable
    P, nq, nt, W = 8, 64, 192, 128
    q = rng.integers(0, 4, size=(P, nq)).astype(np.int8)
    t = np.full((P, nt), 4, dtype=np.int8)
    ql = np.sort(rng.integers(48, nq + 1, P).astype(np.int32))[::-1].copy()
    tl = np.minimum((ql * rng.uniform(1.0, 2.5, P)).astype(np.int32),
                    nt)
    for p in range(P):
        q[p, ql[p]:] = 4
        # target = noisy stretched copy of the query (real-ish paths)
        reps = np.repeat(q[p, :ql[p]], 3)[:tl[p]]
        mask = rng.random(len(reps)) < 0.1
        t[p, :len(reps)] = np.where(mask, (reps + 1) % 4, reps)

    sr, jr, jsr, irr, opsr, edr = [
        np.asarray(v) for v in banded_align_trace_batch(
            q, t, ql, tl, band=W)]
    st, jt, jst, irt, opst, edt = [
        np.asarray(v) for v in banded_align_trace_pallas_t(
            q, t, ql, tl, band=W, interpret=True)]
    assert np.array_equal(sr, st)
    assert np.array_equal(jr, jt)
    assert np.array_equal(jsr, jst)
    assert np.array_equal(irr, irt)
    assert np.array_equal(edr, edt)
    for p in range(P):
        dense_ref = opsr[p][opsr[p] != 0]
        dense_t = unpack_ops_packed(opst[p])
        assert np.array_equal(dense_ref, dense_t), f"pair {p} ops differ"
