import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.kernels.banded import (
    band_starts_np, banded_align_batch, traceback_banded,
)
from c3poa_tpu.ref import banded as ref_banded
from c3poa_tpu.utils import encode


def pad_to(arr, n, fill=4):
    out = np.full(n, fill, dtype=np.int8)
    out[:len(arr)] = arr
    return out


def test_band_starts_match_ref():
    for nq, nt in [(100, 100), (333, 400), (1000, 800), (50, 5)]:
        np.testing.assert_array_equal(
            band_starts_np(nq, nt, 64), ref_banded.band_starts(nq, nt, 64))


@pytest.mark.parametrize("seed", range(4))
def test_banded_kernel_matches_ref(seed):
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(5):
        n = int(rng.integers(150, 400))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.05, 0.025, 0.025)
        pairs.append((encode(q), encode(t)))

    nq_max = max(len(q) for q, _ in pairs)
    nt_max = max(len(t) for _, t in pairs)
    Q = np.stack([pad_to(q, nq_max) for q, _ in pairs])
    T = np.stack([pad_to(t, nt_max) for _, t in pairs])
    ql = np.array([len(q) for q, _ in pairs], dtype=np.int32)
    tl = np.array([len(t) for _, t in pairs], dtype=np.int32)

    W = 64
    scores, j_ends, moves = banded_align_batch(Q, T, ql, tl, band=W)
    scores, j_ends, moves = map(np.asarray, (scores, j_ends, moves))

    for p, (q, t) in enumerate(pairs):
        want_score, want_jend, want_moves, _lo = ref_banded.banded_align(
            q, t, band=W)
        assert scores[p] == want_score, f"pair {p} score"
        assert j_ends[p] == want_jend, f"pair {p} j_end"
        want_rec = ref_banded.traceback(q, t, want_moves, want_jend)
        got_rec = traceback_banded(q, t, moves[p], j_ends[p], W)
        for a, b, name in zip(got_rec[:5], want_rec[:5],
                              ["cover", "base", "qpos", "ins_len", "ins_qstart"]):
            np.testing.assert_array_equal(a, b, err_msg=f"pair {p} {name}")
        assert got_rec.j_start == want_rec.j_start


def test_banded_kernel_length_mismatch_uses_band_path():
    # draft longer than query by ~25% — the interpolated band must track it
    rng = np.random.default_rng(42)
    t = sim.random_seq(rng, 500)
    q = t[:180] + t[280:]   # 100bp deletion in query
    qe, te = encode(q), encode(t)
    W = 256
    scores, j_ends, moves = banded_align_batch(
        qe[None, :], te[None, :],
        np.array([len(qe)], np.int32), np.array([len(te)], np.int32), band=W)
    want_score, want_jend, want_moves, _ = ref_banded.banded_align(
        qe, te, band=W)
    assert int(np.asarray(scores)[0]) == want_score
    rec = traceback_banded(qe, te, np.asarray(moves)[0],
                           int(np.asarray(j_ends)[0]), W)
    # query reconstructs exactly
    out = []
    for j in range(len(te) + 1):
        if rec.ins_len[j] > 0:
            qs = rec.ins_qstart[j]
            out.extend(range(qs, qs + rec.ins_len[j]))
        if j < len(te) and rec.cover[j] == 1:
            out.append(rec.qpos[j])
    np.testing.assert_array_equal(np.array(out), np.arange(len(qe)))


@pytest.mark.parametrize("seed", range(3))
def test_device_traceback_ops_match_moves_path(seed):
    from c3poa_tpu.kernels.banded import banded_align_trace_batch, ops_to_record
    from c3poa_tpu.ref.banded import normalize_record

    rng = np.random.default_rng(seed + 200)
    pairs = []
    for _ in range(4):
        n = int(rng.integers(150, 400))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.05, 0.025, 0.025)
        pairs.append((encode(q), encode(t)))
    nq_max = max(len(q) for q, _ in pairs)
    nt_max = max(len(t) for _, t in pairs)
    Q = np.stack([pad_to(q, nq_max) for q, _ in pairs])
    T = np.stack([pad_to(t, nt_max) for _, t in pairs])
    ql = np.array([len(q) for q, _ in pairs], dtype=np.int32)
    tl = np.array([len(t) for _, t in pairs], dtype=np.int32)
    W = 64

    s1, je1, moves = banded_align_batch(Q, T, ql, tl, band=W)
    s2, je2, js2, i_rem, ops, _edge = banded_align_trace_batch(Q, T, ql, tl, band=W)
    np.testing.assert_array_equal(np.asarray(i_rem), 0)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(je1), np.asarray(je2))
    moves, ops = np.asarray(moves), np.asarray(ops)
    je, js = np.asarray(je2), np.asarray(js2)
    for p, (q, t) in enumerate(pairs):
        via_moves = traceback_banded(q, t, moves[p], int(je[p]), W)
        via_ops = ops_to_record(q, t, ops[p], int(je[p]))
        for a, b, name in zip(via_ops[:5], via_moves[:5],
                              ["cover", "base", "qpos", "ins_len", "ins_qstart"]):
            np.testing.assert_array_equal(a, b, err_msg=f"pair {p} {name}")
        assert via_ops.j_start == via_moves.j_start == int(js[p])
        # native C op walker parity
        from c3poa_tpu import native
        if native.available():
            c_rec = native.ops_record_normalize(q, t, ops[p], int(je[p]))
            py_rec = normalize_record(via_ops, q, t)
            for a, b, name in zip(c_rec[:5], py_rec[:5],
                                  ["cover", "base", "qpos", "ins_len",
                                   "ins_qstart"]):
                np.testing.assert_array_equal(a, b, err_msg=f"native {p} {name}")
