"""Consensus engine: iterative align-to-draft + column vote.

TPU-native redesign of the reference's three-stage consensus
(bin/determine_consensus.py:10-104):

    abPOA MSA/consensus  ->  mappy subread->draft PAF  ->  racon polish

For tandem-repeat subreads (near-identical sequences with independent
errors) POA's graph stays near-linear, so the same computation is expressed
as rounds of banded align-to-draft + column vote — which batches perfectly
on TPU (one aligner kernel launch covers thousands of subreads).

Round structure mirrors the reference stages:
- round 1 ("POA role"):  draft = length-medoid subread; align the core
  subreads; vote.  r==1 short-circuits to the subread itself
  (bin/determine_consensus.py:31-32); r==2 vote ties resolve by quality,
  the analogue of the reference's pairwise merge (bin/consensus.py).
- round 2 ("racon role"): align core + dangling subreads to the round-1
  consensus; vote with quality mask qmin=5 (racon ``-q 5``,
  bin/determine_consensus.py:92).

Zero-repeat reads (single splint peak) splice the two dangling fragments
around their overlap exactly like the reference
(bin/determine_consensus.py:106-136), with the overlap located by
``consensus.overlap`` and merged by a 2-row vote.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from ..ref import banded
from .overlap import find_overlap
from .vote import SubreadAln, record_for_draft, vote_consensus


@dataclasses.dataclass
class ConsensusParams:
    match: int = 5
    mismatch: int = -4
    gap_open: int = 4
    gap_ext: int = 2
    band: int = 128
    qmin: int = 5
    rounds: int = 2
    # mappy-equivalent scoring for the zero-repeat overlap merge
    # (reference bin/determine_consensus.py:117: scoring=(20, 7, 10, 5))
    z_match: int = 20
    z_mismatch: int = -7
    z_gap_open: int = 10
    z_gap_ext: int = 5


def _align(query, qual, draft, p: ConsensusParams) -> SubreadAln:
    rec = banded.align_and_trace(
        query, draft, match=p.match, mismatch=p.mismatch,
        gap_open=p.gap_open, gap_ext=p.gap_ext, band=p.band)
    return SubreadAln(rec, np.asarray(query, dtype=np.int8),
                      np.asarray(qual, dtype=np.int8))


def pick_draft(subreads: Sequence[np.ndarray]) -> int:
    """Length-medoid subread index (closest to median length, first on tie)."""
    lens = np.array([len(s) for s in subreads], dtype=np.int64)
    med = np.median(lens)
    return int(np.argmin(np.abs(lens - med)))


def consensus_round(draft, draft_qual, members, p: ConsensusParams,
                    skip_self: int | None = None):
    """members: list of (codes, quals). Returns (codes, quals)."""
    alns = [record_for_draft(draft, draft_qual)]
    for i, (codes, quals) in enumerate(members):
        if i == skip_self:
            continue
        alns.append(_align(codes, quals, draft, p))
    return vote_consensus(len(draft), alns, qmin=p.qmin)


def consensus_read(subreads, sub_quals, dangling, dangling_quals,
                   p: ConsensusParams | None = None):
    """Consensus for one read's subreads.

    subreads/dangling: lists of int8 code arrays; *_quals: int8 phred arrays.
    Returns (consensus_codes, consensus_quals) — empty arrays if no
    consensus could be formed.  Caller handles the zero-repeat path.
    """
    p = p or ConsensusParams()
    r = len(subreads)
    if r == 0:
        return np.zeros(0, dtype=np.int8), np.zeros(0, dtype=np.int8)

    # round 1: POA role over core subreads
    di = pick_draft(subreads)
    if r == 1:
        cons, cons_q = np.asarray(subreads[0]), np.asarray(sub_quals[0])
    else:
        cons, cons_q = consensus_round(
            subreads[di], sub_quals[di],
            list(zip(subreads, sub_quals)), p, skip_self=di)
        if len(cons) == 0:
            return cons, cons_q

    # round 2+: racon role over core + dangling subreads
    members = list(zip(subreads, sub_quals)) + \
        list(zip(dangling, dangling_quals))
    for _ in range(p.rounds - 1):
        cons, cons_q = consensus_round(cons, cons_q, members, p)
        if len(cons) == 0:
            break
    return cons, cons_q


def zero_repeat_consensus(sub0, qual0, sub1, qual1,
                          p: ConsensusParams | None = None):
    """Splice a single-peak read's two fragments around their overlap.

    sub0 = read[:peak] (5' fragment), sub1 = read[peak:] (3' fragment),
    exactly the reference zero_repeats (bin/determine_consensus.py:106-136):
    result = sub1[:q_st] + merge(sub0[r_st:r_en], sub1[q_st:q_en]) + sub0[r_en:]
    Returns (codes, quals) or empty arrays when no overlap is found.
    """
    p = p or ConsensusParams()
    hit = find_overlap(np.asarray(sub0), np.asarray(sub1))
    if hit is None:
        return np.zeros(0, dtype=np.int8), np.zeros(0, dtype=np.int8)
    r_st, r_en, q_st, q_en = hit

    ov0, ovq0 = np.asarray(sub0[r_st:r_en]), np.asarray(qual0[r_st:r_en])
    ov1, ovq1 = np.asarray(sub1[q_st:q_en]), np.asarray(qual1[q_st:q_en])
    if len(ov0) == 0 or len(ov1) == 0:
        return np.zeros(0, dtype=np.int8), np.zeros(0, dtype=np.int8)
    zp = dataclasses.replace(
        p, match=p.z_match, mismatch=p.z_mismatch,
        gap_open=p.z_gap_open, gap_ext=p.z_gap_ext,
        band=max(p.band, 2 * abs(len(ov0) - len(ov1)) + 64))
    alns = [record_for_draft(ov0, ovq0), _align(ov1, ovq1, ov0, zp)]
    merged, merged_q = vote_consensus(len(ov0), alns, qmin=p.qmin)

    cons = np.concatenate([sub1[:q_st], merged, sub0[r_en:]]).astype(np.int8)
    cons_q = np.concatenate([qual1[:q_st], merged_q, qual0[r_en:]]).astype(np.int8)
    return cons, cons_q
