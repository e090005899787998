import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.consensus import consensus_read, zero_repeat_consensus
from c3poa_tpu.consensus.engine import ConsensusJob, ConsensusParams, consensus_many
from c3poa_tpu.consensus.overlap import find_overlap
from c3poa_tpu.consensus.vote import vote_consensus, record_for_draft, SubreadAln
from c3poa_tpu.ref import banded
from c3poa_tpu.utils import encode, decode


def identity(a: np.ndarray, b: np.ndarray) -> float:
    """Global alignment identity between two code arrays."""
    rec = banded.align_and_trace(a, b, band=256)
    matches = int(((rec.cover == 1) & (rec.base == b)).sum())
    return matches / max(len(a), len(b))


def make_copies(rng, truth, n, error, qual=25):
    subs, quals = [], []
    for _ in range(n):
        s = encode(sim.mutate(rng, truth, error * 0.5, error * 0.25, error * 0.25))
        subs.append(s)
        quals.append(np.full(len(s), qual, dtype=np.int8))
    return subs, quals


@pytest.mark.parametrize("n,error,min_ident", [
    (3, 0.05, 0.99),
    (5, 0.08, 0.99),
    (10, 0.10, 0.99),
    # two equal-quality voters coin-flip disagreements (as does the
    # reference's pairwise merge) -> ~1.5x the per-read error floor
    (2, 0.05, 0.95),
])
def test_consensus_recovers_truth(n, error, min_ident):
    rng = np.random.default_rng(n * 100 + int(error * 100))
    truth = sim.random_seq(rng, 800)
    subs, quals = make_copies(rng, truth, n, error)
    cons, _ = consensus_read(subs, quals, [], [])
    ident = identity(cons, encode(truth))
    assert ident >= min_ident, f"identity {ident:.4f} < {min_ident}"


def test_consensus_single_subread_is_passthrough_then_polish():
    rng = np.random.default_rng(0)
    truth = sim.random_seq(rng, 500)
    subs, quals = make_copies(rng, truth, 1, 0.05)
    cons, _ = consensus_read(subs, quals, [], [])
    # with one subread and no danglings, round 2 votes with itself only
    np.testing.assert_array_equal(cons, subs[0])


def test_consensus_uses_dangling_fragments():
    rng = np.random.default_rng(1)
    truth = sim.random_seq(rng, 600)
    subs, quals = make_copies(rng, truth, 2, 0.08)
    # dangling fragments cover the two halves — they should break 1-1 ties
    d1 = encode(sim.mutate(rng, truth[:350], 0.04, 0.02, 0.02))
    d2 = encode(sim.mutate(rng, truth[250:], 0.04, 0.02, 0.02))
    dq = [np.full(len(d1), 30, dtype=np.int8), np.full(len(d2), 30, dtype=np.int8)]
    cons_with, _ = consensus_read(subs, quals, [d1, d2], dq)
    cons_without, _ = consensus_read(subs, quals, [], [])
    assert identity(cons_with, encode(truth)) >= identity(cons_without, encode(truth))
    assert identity(cons_with, encode(truth)) > 0.94


def test_vote_mismatch_quality_tiebreak():
    # two records disagree at one column; higher quality wins
    # (reference bin/consensus.py:21-25 analogue)
    draft = encode("ACGTACGT")
    q_hi = np.full(8, 30, dtype=np.int8)
    q_lo = np.full(8, 10, dtype=np.int8)
    other = draft.copy()
    other[3] = 0  # T -> A at col 3
    alns = [record_for_draft(draft, q_lo),
            SubreadAln(record_for_draft(other, q_hi).rec, other, q_hi)]
    cons, _ = vote_consensus(8, alns)
    assert decode(cons) == "ACGAACGT"
    # flip qualities: draft base wins
    alns = [record_for_draft(draft, q_hi),
            SubreadAln(record_for_draft(other, q_lo).rec, other, q_lo)]
    cons, _ = vote_consensus(8, alns)
    assert decode(cons) == "ACGTACGT"


def test_vote_majority_insertion_called():
    rng = np.random.default_rng(2)
    truth = sim.random_seq(rng, 300)
    # draft is missing one base that all other subreads carry
    draft = encode(truth[:150] + truth[151:])
    dq = np.full(len(draft), 20, dtype=np.int8)
    subs, quals = make_copies(rng, truth, 4, 0.02)
    from c3poa_tpu.consensus.engine import serial_align_many
    p = ConsensusParams()
    alns = [record_for_draft(draft, dq)] + \
        serial_align_many([(s, q, draft) for s, q in zip(subs, quals)], p)
    cons, _ = vote_consensus(len(draft), alns)
    assert identity(cons, encode(truth)) > 0.995


def test_find_overlap_exact():
    rng = np.random.default_rng(3)
    truth = sim.random_seq(rng, 1000)
    # fragment layout of a 1-peak read: sub0 ends with copy tail,
    # sub1 begins with copy head; they share truth[300:700]
    sub0 = encode(truth[:700])
    sub1 = encode(truth[300:])
    hit = find_overlap(sub0, sub1)
    assert hit is not None
    r_st, r_en, q_st, q_en = hit
    assert abs(r_st - 300) <= 2 and abs(r_en - 700) <= 2
    assert abs(q_st - 0) <= 2 and abs(q_en - 400) <= 2


def test_zero_repeat_consensus_splices():
    rng = np.random.default_rng(4)
    truth = sim.random_seq(rng, 900)
    # molecule copy seen twice, fragmented: sub1 has head 0:600 (with errors),
    # sub0 has tail 300:900
    f_tail = sim.mutate(rng, truth[300:], 0.03, 0.015, 0.015)
    f_head = sim.mutate(rng, truth[:600], 0.03, 0.015, 0.015)
    sub0 = encode(f_tail)
    sub1 = encode(f_head)
    q0 = np.full(len(sub0), 20, dtype=np.int8)
    q1 = np.full(len(sub1), 20, dtype=np.int8)
    cons, _ = zero_repeat_consensus(sub0, q0, sub1, q1)
    assert len(cons) > 0
    # flat qualities make every pairwise-merge tie go to the 3' fragment
    # (reference bin/consensus.py tie rule), so a single molecule at 6%
    # error sits just under .95 identity; aggregate QV is tracked by
    # tools/qv_sweep.py (pairwise >= vote at every copy number)
    assert identity(cons, encode(truth)) > 0.94


def test_zero_repeat_no_overlap_returns_empty():
    rng = np.random.default_rng(5)
    a = encode(sim.random_seq(rng, 400))
    b = encode(sim.random_seq(rng, 400))
    qa = np.full(400, 20, dtype=np.int8)
    cons, _ = zero_repeat_consensus(a, qa, b, qa)
    assert len(cons) == 0


def test_single_repeat_with_partial_dangling_not_truncated():
    """A 1-repeat read with one PARTIAL dangling fragment must take the
    column vote, not the 2-row pairwise merge: the merge's gap-run rule
    would hand whole uncovered draft regions to the fragment's gap row
    and truncate the consensus (reference pairwise applies only to two
    full repeats, bin/determine_consensus.py:33-41)."""
    from c3poa_tpu import sim
    from c3poa_tpu.utils.seqs import encode

    rng = np.random.default_rng(0)
    truth = sim.random_seq(rng, 2000)
    draft = encode(sim.mutate(rng, truth, 0.03, 0.015, 0.015))
    dq = np.full(len(draft), 12, dtype=np.int8)
    frag = encode(sim.mutate(rng, truth[700:1200], 0.03, 0.015, 0.015))
    fq = np.full(len(frag), 20, dtype=np.int8)
    job = ConsensusJob([draft], [dq], [frag], [fq])
    (cons, _cq), = consensus_many([job], ConsensusParams())
    assert len(cons) > 0.9 * len(draft), (len(cons), len(draft))


def test_fast_band_escalation_matches_full_band():
    """Fast-band (W=64) core pairs whose path touches the band edge must
    be realigned at the full band in EVERY backend: a planted 100 bp
    deletion forces the path off the interpolated diagonal.  Results
    must equal a pure full-band run, and the edge flag must fire."""
    import numpy as np

    from c3poa_tpu import native, sim
    from c3poa_tpu.consensus.engine import (
        ConsensusParams, serial_align_many,
    )
    from c3poa_tpu.utils.seqs import encode

    rng = np.random.default_rng(23)
    ins = sim.random_seq(rng, 1500)
    # query lost a 100bp block: relative drift 100 > 64-band half-width
    q = encode(sim.mutate(rng, ins[:700] + ins[800:], 0.04, 0.02, 0.02))
    t = encode(sim.mutate(rng, ins, 0.04, 0.02, 0.02))
    qual = np.full(len(q), 20, np.int8)

    # the 64-band walk must flag the edge
    _rec, edge = native.align_and_trace_c(q, t, band=64, with_edge=True)
    assert edge, "planted 100bp deletion did not touch the 64-band edge"

    p_fast = ConsensusParams(fast_band=64)
    p_full = ConsensusParams(fast_band=0)
    (a_fast,) = serial_align_many([(q, qual, t, 64)], p_fast)
    (a_full,) = serial_align_many([(q, qual, t)], p_full)
    assert a_fast.rec.score == a_full.rec.score
    np.testing.assert_array_equal(a_fast.rec.cover, a_full.rec.cover)
    np.testing.assert_array_equal(a_fast.rec.ins_len, a_full.rec.ins_len)

    # device path: the batched backend escalates identically
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    res = TpuBackend()._align_many([(q, qual, t, 64)], p_fast)
    assert res[0].rec.score == a_full.rec.score
    np.testing.assert_array_equal(res[0].rec.cover, a_full.rec.cover)
