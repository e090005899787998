"""Parity of the scalar-C POA twin (native/poa.c) against the numpy
spec (ref/poa.py), plus the engine's early-dispatch routed path.

The C twin must be BIT-identical: same graph tie-breaks, same traceback,
same consensus path (docstring of native/poa.c lists the replicated
rules).  Any divergence would silently change divergence-routed reads'
output between hosts with and without the native library.
"""

import numpy as np
import pytest

from c3poa_tpu import native, sim
from c3poa_tpu.consensus.engine import (
    ConsensusJob, ConsensusParams, consensus_many,
)
from c3poa_tpu.ref.poa import poa_consensus
from c3poa_tpu.utils.seqs import encode

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _adversarial_case(rng, L, copies, err):
    insert = sim.random_seq(rng, L)
    seqs, quals = [], []
    for _ in range(copies):
        kind = rng.random()
        base = insert
        if kind < 0.3:       # truncation
            cut = int(L * rng.uniform(0.5, 1.0))
            base = insert[:cut] if rng.random() < 0.5 else insert[-cut:]
        elif kind < 0.5:     # chimera
            base = insert[:int(L * 0.6)] + sim.random_seq(rng, int(L * 0.5))
        s, q = sim.mutate_with_quals(rng, base, err * 0.5, err * 0.25,
                                     err * 0.25)
        seqs.append(encode(s))
        quals.append(q)
    return seqs, quals


@pytest.mark.parametrize("seed", range(4))
def test_poa_c_bit_identical_adversarial(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        L = int(rng.integers(40, 500))
        copies = int(rng.integers(2, 8))
        err = float(rng.uniform(0.03, 0.2))
        seqs, quals = _adversarial_case(rng, L, copies, err)
        want = poa_consensus(seqs, quals)
        got = native.poa_consensus_c(seqs, quals)
        assert got is not None
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


def test_poa_c_declines_exotic_params():
    """int16-range guard: giant scores / exotic params fall back."""
    rng = np.random.default_rng(0)
    seqs, quals = _adversarial_case(rng, 60, 3, 0.05)
    assert native.poa_consensus_c(seqs, quals, match=600) is None
    assert native.poa_consensus_c(seqs, quals, gap_open=200) is None


def test_poa_c_trivial_inputs():
    empty = np.zeros(0, dtype=np.int8)
    got = native.poa_consensus_c([empty], [empty])
    assert got is not None and len(got[0]) == 0
    one = encode("ACGTACGT")
    q = np.full(8, 30, dtype=np.int8)
    got = native.poa_consensus_c([one], [q])
    want = poa_consensus([one], [q])
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_engine_routed_reads_unchanged_by_early_dispatch():
    """Chimera-heavy jobs route through the futures path
    (consensus_align submits, consensus_finalize collects); outputs must
    equal the direct spec-path POA consensus."""
    rng = np.random.default_rng(11)
    p = ConsensusParams()
    jobs = []
    for _ in range(6):
        seqs, quals = _adversarial_case(rng, 300, 5, 0.12)
        jobs.append(ConsensusJob(seqs, quals, [], []))
    got = consensus_many(jobs, p)
    from c3poa_tpu.consensus.engine import (
        _diverged_owner, consensus_prepare,
    )
    state = consensus_prepare(jobs, p)
    routed = [ji for ji in range(len(jobs))
              if isinstance(state["cons"][ji], tuple)
              and _diverged_owner(state["by_owner"].get(ji, []),
                                  p.poa_fallback)]
    assert routed, "test corpus failed to route any read"
    assert state["poa_futures"], "no POA futures were submitted"
    for ji in routed:
        want = poa_consensus(jobs[ji].subreads, jobs[ji].sub_quals)
        np.testing.assert_array_equal(got[ji][0], want[0])
        np.testing.assert_array_equal(got[ji][1], want[1])
