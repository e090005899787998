"""The exact POA consensus oracle (ref/poa.py) — the abPOA-class
algorithm (reference bin/determine_consensus.py:42-47) used to bound the
production engine's accuracy in adversarial regimes and as the routed
fallback for divergence-flagged reads."""

import numpy as np

from c3poa_tpu import sim
from c3poa_tpu.ref.lev import levenshtein
from c3poa_tpu.ref.poa import poa_consensus
from c3poa_tpu.utils.seqs import decode, encode


def _q(n, v=20):
    return np.full(n, v, dtype=np.int8)


def test_identical_copies_roundtrip():
    rng = np.random.default_rng(0)
    s = encode(sim.random_seq(rng, 300))
    cons, cq = poa_consensus([s] * 3, [_q(300)] * 3)
    assert np.array_equal(cons, s)
    assert (cq == 20).all()


def test_majority_outvotes_each_error_type():
    rng = np.random.default_rng(1)
    s = encode(sim.random_seq(rng, 300))
    sub = s.copy()
    sub[100] = (sub[100] + 1) % 4
    dele = np.delete(s, 150)
    ins = np.insert(s, 200, 2)
    for variant in (sub, dele, ins):
        cons, _ = poa_consensus([s, variant, s],
                                [_q(300), _q(len(variant)), _q(300)])
        assert np.array_equal(cons, s), "2-of-3 majority must win"


def test_noisy_copies_converge():
    rng = np.random.default_rng(2)
    ins = sim.random_seq(rng, 500)
    copies = [encode(sim.mutate(rng, ins, 0.05, 0.025, 0.025))
              for _ in range(8)]
    cons, _ = poa_consensus(copies, [_q(len(c)) for c in copies])
    assert levenshtein(decode(cons), ins) <= 10


def test_truncated_copy_does_not_degrade():
    """Dovetail alignment: a half-length copy adds support to its span
    without end-gap damage elsewhere (the failure mode that motivates
    routing divergent reads away from align-to-draft voting)."""
    rng = np.random.default_rng(3)
    ins = sim.random_seq(rng, 500)
    copies = [encode(sim.mutate(rng, ins, 0.05, 0.025, 0.025))
              for _ in range(6)]
    quals = [_q(len(c)) for c in copies]
    base = levenshtein(decode(poa_consensus(copies, quals)[0]), ins)
    # an INDEPENDENT half-length copy (reusing copies[0][:250] would
    # double-weight copy 0's errors — a correlated voter, not a
    # truncation effect)
    trunc = encode(sim.mutate(rng, ins[:250], 0.05, 0.025, 0.025))
    with_t = poa_consensus(copies + [trunc],
                           quals + [_q(len(trunc))])[0]
    assert levenshtein(decode(with_t), ins) <= base + 2


def test_divergence_detector_routes_chimeric_reads():
    """The engine's poa_fallback detector: chimera-laden reads route to
    the POA graph path (matching its accuracy); clean reads do not
    route (outputs unchanged — the golden fixtures depend on this)."""
    from c3poa_tpu.consensus.engine import ConsensusParams, consensus_read
    from c3poa_tpu.utils import prof

    rng = np.random.default_rng(5)
    ins = sim.random_seq(rng, 600)
    subs = [encode(sim.mutate(rng, ins, 0.03, 0.015, 0.015))
            for _ in range(6)]
    quals = [_q(len(s)) for s in subs]
    # poison two copies with junk tails (chimeras)
    for k in (1, 4):
        junk = encode(sim.random_seq(rng, 250))
        subs[k] = np.concatenate([subs[k], junk])
        quals[k] = np.concatenate([quals[k], _q(250)])

    p = ConsensusParams()
    prof.reset()
    cons, _ = consensus_read(subs, quals, [], [], p)
    assert prof.current.counts.get("poa_fallback_reads", 0) == 1
    oracle, _ = poa_consensus(subs, quals)
    assert np.array_equal(cons, oracle)  # routed = the POA path

    # clean read: no routing, vote path untouched
    clean = [encode(sim.mutate(rng, ins, 0.03, 0.015, 0.015))
             for _ in range(6)]
    cq = [_q(len(s)) for s in clean]
    prof.reset()
    consensus_read(clean, cq, [], [], p)
    assert prof.current.counts.get("poa_fallback_reads", 0) == 0

    # detector off: the vote path handles the chimeric read
    p_off = ConsensusParams(poa_fallback=0.0)
    prof.reset()
    consensus_read(subs, quals, [], [], p_off)
    assert prof.current.counts.get("poa_fallback_reads", 0) == 0


def test_chimeric_tail_stays_out_of_graph():
    """A copy with a garbage tail (chimera) fuses only its aligned core;
    the junk must not reach the consensus."""
    rng = np.random.default_rng(4)
    ins = sim.random_seq(rng, 400)
    junk = sim.random_seq(rng, 200)
    copies = [encode(sim.mutate(rng, ins, 0.04, 0.02, 0.02))
              for _ in range(5)]
    chimera = np.concatenate([copies[0], encode(junk)])
    cons, _ = poa_consensus(copies + [chimera],
                            [_q(len(c)) for c in copies]
                            + [_q(len(chimera))])
    assert levenshtein(decode(cons), ins) <= 8
