import numpy as np
import pytest

from c3poa_tpu.ref import banded
from c3poa_tpu.utils import encode
from c3poa_tpu import sim


def mutated_pair(rng, n=300, error=0.1):
    t = sim.random_seq(rng, n)
    q = sim.mutate(rng, t, error * 0.5, error * 0.25, error * 0.25)
    return encode(q), encode(t)


@pytest.mark.parametrize("seed", range(6))
def test_banded_score_matches_naive_textbook(seed):
    rng = np.random.default_rng(seed)
    q, t = mutated_pair(rng, n=120, error=0.15)
    want, *_ = banded.semiglobal_naive(q, t)
    got, _, _, _ = banded.banded_align(q, t, band=512)
    assert got == want


def test_banded_score_matches_naive_len_mismatch():
    rng = np.random.default_rng(42)
    t = encode(sim.random_seq(rng, 150))
    q = t[20:100]
    want, *_ = banded.semiglobal_naive(q, t)
    got, j_end, _, _ = banded.banded_align(q, t, band=512)
    assert got == want == 80 * 5
    assert j_end == 100


def reconstruct_query(rec, nt):
    """Rebuild the query sequence from an AlignRecord (must round-trip)."""
    out = []
    for j in range(nt + 1):
        if rec.ins_len[j] > 0:
            qs = rec.ins_qstart[j]
            out.extend(range(qs, qs + rec.ins_len[j]))
        if j < nt and rec.cover[j] == 1:
            out.append(rec.qpos[j])
    return np.array(out, dtype=np.int64)


@pytest.mark.parametrize("seed", range(6))
def test_traceback_roundtrips_query(seed):
    rng = np.random.default_rng(seed + 100)
    q, t = mutated_pair(rng, n=250, error=0.12)
    rec = banded.align_and_trace(q, t, band=128)
    qidx = reconstruct_query(rec, len(t))
    # every query position consumed exactly once, in order
    np.testing.assert_array_equal(qidx, np.arange(len(q)))
    # bases recorded match the query
    covered = rec.cover == 1
    np.testing.assert_array_equal(rec.base[covered], q[rec.qpos[covered]])


def test_traceback_identity_alignment():
    rng = np.random.default_rng(7)
    t = encode(sim.random_seq(rng, 200))
    rec = banded.align_and_trace(t, t, band=64)
    assert rec.score == 200 * 5
    assert rec.j_start == 0 and rec.j_end == 200
    assert (rec.cover == 1).all()
    assert rec.ins_len.sum() == 0
    np.testing.assert_array_equal(rec.base, t)


def test_traceback_subsequence_semiglobal():
    rng = np.random.default_rng(8)
    t = encode(sim.random_seq(rng, 300))
    q = t[50:250].copy()
    rec = banded.align_and_trace(q, t, band=256)
    assert rec.score == 200 * 5
    assert rec.j_start == 50 and rec.j_end == 250
    assert (rec.cover[:50] == 0).all() and (rec.cover[250:] == 0).all()
    assert (rec.cover[50:250] == 1).all()
