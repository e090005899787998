"""consensus/pairwise.py vs a literal string port of the reference's
bin/consensus.py (the executable spec), on random 2-row MSAs and on MSAs
reconstructed from real alignments."""

import numpy as np
import pytest

from c3poa_tpu.consensus.pairwise import (
    GAP, build_msa, merge_rows, normalize_qual, pairwise_merge,
)
from c3poa_tpu.ref.banded import align_and_trace
from c3poa_tpu.utils.seqs import decode, encode

BASES = "ACGTN-"


# ---- literal spec port (reference bin/consensus.py:4-74) ----

def spec_normalize_len(seq: str, quality: str) -> str:
    seqIndex, qualIndex = 0, 0
    newQuality = ""
    while qualIndex < len(quality):
        if seq[seqIndex] != "-":
            newQuality += quality[qualIndex]
            qualIndex += 1
            seqIndex += 1
        elif seq[seqIndex] == "-" and qualIndex == 0:
            newQuality += quality[qualIndex]
            seqIndex += 1
        else:
            newQuality += chr(
                int((ord(quality[qualIndex - 1]) + ord(quality[qualIndex])) / 2))
            seqIndex += 1
    if len(seq) != len(newQuality):
        gapLen = 0
        while seq[-1 - gapLen] == "-":
            newQuality += newQuality[-1]
            gapLen += 1
    return newQuality


def spec_avg_qual(qual: str, i: int, gapLen: int) -> float:
    return sum(ord(x) for x in list(qual[i:i + gapLen])) / gapLen


def spec_consensus(seqA: str, seqB: str, qualA: str, qualB: str) -> str:
    seqAqual = spec_normalize_len(seqA, qualA)
    seqBqual = spec_normalize_len(seqB, qualB)
    consensus = ""
    i = 0
    while i != len(seqA):
        if seqA[i] == seqB[i]:
            consensus += seqA[i]
        if seqA[i] != seqB[i] and seqA[i] != "-" and seqB[i] != "-":
            if ord(seqAqual[i]) > ord(seqBqual[i]):
                consensus += seqA[i]
            else:
                consensus += seqB[i]
        if seqA[i] == "-" or seqB[i] == "-":
            gapLen = 1
            if seqA[i] == "-":
                gapSeq = seqA
            else:
                gapSeq = seqB
            try:
                while gapSeq[i + gapLen] == "-":
                    gapLen += 1
            except IndexError:
                gapLen = 1
            if spec_avg_qual(seqAqual, i, gapLen) > \
                    spec_avg_qual(seqBqual, i, gapLen):
                consensus += seqA[i:i + gapLen]
            else:
                consensus += seqB[i:i + gapLen]
            i += gapLen
            continue
        i += 1
    return consensus.replace("-", "")


# ---- helpers ----

def random_msa(rng, n):
    """Random 2-row MSA with no both-gap columns and non-gap first/last
    real chars per row (as real MSAs have)."""
    a, b = [], []
    for _ in range(n):
        kind = rng.integers(0, 4)
        if kind == 0:
            c = BASES[rng.integers(0, 4)]
            a.append(c), b.append(c)
        elif kind == 1:
            a.append(BASES[rng.integers(0, 4)])
            b.append(BASES[rng.integers(0, 4)])
        elif kind == 2:
            a.append("-"), b.append(BASES[rng.integers(0, 4)])
        else:
            a.append(BASES[rng.integers(0, 4)]), b.append("-")
    # rows must contain at least one real char
    if all(c == "-" for c in a):
        a[0] = "A"
    if all(c == "-" for c in b):
        b[0] = "C"
    return "".join(a), "".join(b)


def row_to_codes(row: str) -> np.ndarray:
    m = {c: i for i, c in enumerate("ACGTN")}
    m["-"] = GAP
    return np.asarray([m[c] for c in row], dtype=np.int8)


def real_quals(row: str, rng) -> np.ndarray:
    n = sum(c != "-" for c in row)
    return rng.integers(0, 50, size=n).astype(np.int8)


def qual_str(q: np.ndarray) -> str:
    return "".join(chr(int(v) + 33) for v in q)


def test_merge_matches_spec_on_random_msas():
    rng = np.random.default_rng(0)
    for trial in range(300):
        n = int(rng.integers(2, 40))
        sa, sb = random_msa(rng, n)
        qa_real, qb_real = real_quals(sa, rng), real_quals(sb, rng)
        expect = spec_consensus(sa, sb, qual_str(qa_real), qual_str(qb_real))

        A, B = row_to_codes(sa), row_to_codes(sb)
        qa = normalize_qual(A, qa_real)
        qb = normalize_qual(B, qb_real)
        got_codes, got_quals = merge_rows(A, B, qa, qb)
        got = decode(got_codes)
        assert got == expect, (trial, sa, sb)
        assert len(got_quals) == len(got_codes)


def test_normalize_qual_matches_spec():
    rng = np.random.default_rng(1)
    for _ in range(200):
        n = int(rng.integers(1, 30))
        sa, _ = random_msa(rng, n)
        q = real_quals(sa, rng)
        expect = [ord(c) - 33 for c in spec_normalize_len(sa, qual_str(q))]
        got = normalize_qual(row_to_codes(sa), q)
        assert list(got) == expect, sa


def test_build_msa_roundtrip():
    """The reconstructed MSA rows must spell the draft and query exactly."""
    rng = np.random.default_rng(2)
    for _ in range(50):
        draft = rng.integers(0, 4, size=int(rng.integers(20, 120))).astype(np.int8)
        # query: mutated copy
        q = list(draft)
        for _ in range(int(rng.integers(0, 10))):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, len(q)))
            if op == 0:
                q[p] = int(rng.integers(0, 4))
            elif op == 1 and len(q) > 10:
                del q[p]
            else:
                q.insert(p, int(rng.integers(0, 4)))
        query = np.asarray(q, dtype=np.int8)
        rec = align_and_trace(query, draft)
        A, B = build_msa(draft, rec, query)
        assert decode(A[A != GAP]) == decode(draft)
        # the aligned span of the query appears in order in row B
        b_real = B[B != GAP]
        assert decode(b_real) == decode(query)
        assert not np.any((A == GAP) & (B == GAP))


def test_pairwise_merge_identical_rows():
    draft = encode("ACGTACGTACGTACGT")
    qd = np.full(len(draft), 30, dtype=np.int8)
    rec = align_and_trace(draft, draft)
    cons, cq = pairwise_merge(draft, qd, rec, draft, qd)
    assert decode(cons) == "ACGTACGTACGTACGT"


def test_pairwise_merge_gap_run_quality_block():
    """A 3-base deletion run resolves as one block by average quality:
    the high-quality side keeps (or drops) all three bases together."""
    draft = encode("AAAACCCGGGTTTACGACGT")
    query = np.concatenate([draft[:8], draft[11:]]).astype(np.int8)  # drop GGT
    rec = align_and_trace(query, draft)
    # draft higher quality over the runs -> keeps its deleted bases
    cons, _ = pairwise_merge(draft, np.full(len(draft), 40, dtype=np.int8),
                             rec, query, np.full(len(query), 10, dtype=np.int8))
    assert decode(cons) == decode(draft)
    # query higher quality -> the deletion blocks are dropped
    cons2, _ = pairwise_merge(draft, np.full(len(draft), 10, dtype=np.int8),
                              rec, query, np.full(len(query), 40, dtype=np.int8))
    assert decode(cons2) == decode(query)
