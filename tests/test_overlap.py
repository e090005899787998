"""Parity: native/overlap.c c3_find_overlap vs the numpy find_overlap.

The C path must return bit-identical coordinates on every input class the
pipeline produces: clean overlaps, error-laden fragments, N runs,
repetitive sequences (the 8-hit cap path), and no-overlap pairs.
"""

import numpy as np
import pytest

from c3poa_tpu import native
from c3poa_tpu.consensus.overlap import find_overlap

pytestmark = pytest.mark.skipif(
    not native.available()
    or native.find_overlap_c(np.zeros(20, np.int8), np.zeros(20, np.int8))
    == "unavailable",
    reason="native overlap symbol not built")


def _mutate(rng, seq, err):
    seq = seq.copy()
    hit = rng.random(len(seq)) < err
    seq[hit] = rng.integers(0, 4, int(hit.sum()))
    return seq


def _check(target, query, **kw):
    got = native.find_overlap_c(target, query, **kw)
    want = find_overlap(target, query, use_native=False, **kw)
    assert got == want, (got, want, len(target), len(query))


def test_parity_random_overlaps():
    rng = np.random.default_rng(0)
    for trial in range(200):
        L = int(rng.integers(40, 3000))
        t = rng.integers(0, 4, L).astype(np.int8)
        # query = suffix of target + novel tail (the dangling shape)
        cut = int(rng.integers(0, L))
        tail = rng.integers(0, 4, int(rng.integers(0, 400))).astype(np.int8)
        q = np.concatenate([_mutate(rng, t[cut:], 0.06), tail]).astype(np.int8)
        if len(q) == 0:
            continue
        _check(t, q)


def test_parity_n_runs_and_repeats():
    rng = np.random.default_rng(1)
    for trial in range(100):
        L = int(rng.integers(100, 1500))
        t = rng.integers(0, 4, L).astype(np.int8)
        # sprinkle N runs (code 4) and a repetitive block (8-hit cap path)
        for _ in range(int(rng.integers(0, 4))):
            s = int(rng.integers(0, L - 5))
            t[s:s + int(rng.integers(1, 30))] = 4
        rep = np.tile(rng.integers(0, 4, 17).astype(np.int8),
                      int(rng.integers(2, 9)))
        ins = int(rng.integers(0, max(1, L - len(rep))))
        t[ins:ins + len(rep)] = rep[:max(0, min(len(rep), L - ins))]
        q = _mutate(rng, t[int(rng.integers(0, L // 2)):], 0.05)
        _check(t, q)


def test_parity_no_overlap_and_short():
    rng = np.random.default_rng(2)
    t = rng.integers(0, 4, 500).astype(np.int8)
    q = rng.integers(0, 4, 300).astype(np.int8)  # unrelated: usually None
    _check(t, q)
    # below k
    _check(t[:10], q)
    _check(t, q[:10])
    # all-N query
    _check(t, np.full(60, 4, dtype=np.int8))


def test_parity_parameter_sweep():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 800).astype(np.int8)
    q = _mutate(rng, t[200:], 0.08)
    for k in (11, 15, 19):
        for band in (32, 64, 128):
            for mm in (1, 3, 8):
                _check(t, q, k=k, band=band, min_matches=mm)


def _reference_min_dists(seq, idx_seqs):
    """Literal port of the reference match_index distance loop
    (C3POa_postprocessing.py:269-278): positions outer, indexes inner,
    break at the first index whose window overruns — later-listed
    indexes lose tail windows after a longer index.  Indexes with no
    valid window fall back to their own length (our documented
    deviation: the reference raises there)."""
    from c3poa_tpu.ref.lev import levenshtein
    dists = {i: [] for i in range(len(idx_seqs))}
    for position in range(len(seq)):
        for i, idx_seq in enumerate(idx_seqs):
            query = seq[position:position + len(idx_seq)]
            if len(query) != len(idx_seq):
                break
            dists[i].append(levenshtein(query, idx_seq))
    return [min(dists[i]) if dists[i] else len(idx_seqs[i])
            for i in range(len(idx_seqs))]


def test_sliding_min_dists_c_parity():
    """C sliding-Levenshtein demux distances == the reference loop and
    the Python fallback on random junction windows, mixed index lengths
    (the reference's inner break truncates tail windows), short windows
    (n < m), and exact/near matches."""
    from c3poa_tpu.pipeline.postprocess import match_index
    if native.sliding_min_dists_c("ACGT", ("AC",)) is None:
        pytest.skip("native demux symbol not built")
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    idxs = tuple("".join(rng.choice(bases, int(rng.integers(8, 17))))
                 for _ in range(12))
    for trial in range(300):
        n = int(rng.integers(1, 30))
        seq = "".join(rng.choice(bases, n))
        if trial % 3 == 0 and n >= 16:
            # plant a mutated index so best<2 margins get exercised
            idx = idxs[trial % len(idxs)]
            pos = int(rng.integers(0, n - len(idx))) if n > len(idx) else 0
            s = list(seq)
            s[pos:pos + len(idx)] = list(idx)
            if rng.random() < 0.5 and len(idx) > 2:
                s[pos + 1] = "ACGT"[int(rng.integers(0, 4))]
            seq = "".join(s)[:n]
        got = native.sliding_min_dists_c(seq, idxs)
        want = _reference_min_dists(seq, idxs)
        assert got.tolist() == want, (seq, got.tolist(), want)
        # the no-native Python fallback must agree with the C decision
        seq_to_idx = {s: f"I{i}" for i, s in enumerate(idxs)}
        got_name = match_index(seq, seq_to_idx)
        pairs = sorted(zip([f"I{i}" for i in range(len(idxs))], want),
                       key=lambda x: x[1])
        exp = pairs[0][0] if (pairs[0][1] < 2
                              and pairs[1][1] - pairs[0][1] > 1) else "-"
        assert got_name == exp
