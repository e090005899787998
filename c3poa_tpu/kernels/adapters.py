"""Batched adapter location kernel (BLAT-postprocess role).

Replaces BLAT's adapter->consensus alignment (reference
C3POa_postprocessing.py:229-264): for each (read, adapter, orientation)
combo, the best two local alignment hits with coordinates, so the host can
apply the reference's extrapolated-position logic and its
"exactly one + and one - hit" accept rule (:323-326).

DP: end-anchored local alignment over adapter chars (scan axis) carrying,
besides H, the path's target-start and query-start as payloads; the in-row
gap-run resolution is a prefix-max doubling pass that moves payloads with
values (exact match of ref.sw.local_hits tie rules: no-gap beats run on
ties; among run sources the later start wins).  The second hit is the max
over end columns whose alignment span is near-disjoint from the best
hit's span — only (B, C) scalars leave the device.

Scoring: match +1 / mismatch -1 / gap -1 / N neutral, local floor 0 — the
score plays BLAT's "matches" role, so the reference's matches>10 threshold
(C3POa_postprocessing.py:252) maps to score > 10.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import ADAPTER_OVERLAP_TOL as OVERLAP_TOL

NEG = jnp.int32(-(2 ** 30))


@partial(jax.jit, static_argnames=("match", "mismatch", "gap"))
def adapter_hits_batch(reads: jax.Array, adapters: jax.Array,
                       adapter_lens: jax.Array,
                       match: int = 1, mismatch: int = -1, gap: int = 1):
    """reads (B, L) int8 pad 4; adapters (C, m) int8 pad 4 (fwd and rc
    orientations are separate combos); adapter_lens (C,) int32.

    Returns per (B, C): best1 (score, j_end, q_end, t_start, q_start) and
    best2 score — j/t = read coords, q = adapter coords, all 0-based,
    inclusive end indices (matching ref.sw.local_hits).
    """
    B, L = reads.shape
    C, m = adapters.shape
    reads = reads.astype(jnp.int32)
    adapters = adapters.astype(jnp.int32)
    jarr = jnp.arange(L, dtype=jnp.int32)[None, None, :]

    H0 = jnp.zeros((B, C, L + 1), dtype=jnp.int32)
    TS0 = jnp.broadcast_to(jnp.arange(L + 1, dtype=jnp.int32)[None, None, :],
                           (B, C, L + 1)).copy()
    QS0 = jnp.zeros((B, C, L + 1), dtype=jnp.int32)
    colmax0 = jnp.zeros((B, C, L), dtype=jnp.int32)
    pay0 = jnp.zeros((B, C, L), dtype=jnp.int32)  # qend
    ts_best0 = jnp.zeros((B, C, L), dtype=jnp.int32)
    qs_best0 = jnp.zeros((B, C, L), dtype=jnp.int32)

    def step(carry, sc_i):
        H, TS, QS, colmax, qend_b, ts_b, qs_b = carry
        sc, i = sc_i                                  # (C,) chars, scalar i
        r = reads[:, None, :]                         # (B, 1, L)
        q = sc[None, :, None]                         # (1, C, 1)
        s_row = jnp.where((q == 4) | (r == 4), 0,
                          jnp.where(q == r, match, mismatch))
        diag = H[:, :, :-1] + s_row
        fresh = H[:, :, :-1] <= 0
        dTS = jnp.where(fresh, jarr, TS[:, :, :-1])
        dQS = jnp.where(fresh, i, QS[:, :, :-1])
        upv = H[:, :, 1:] - gap
        take_diag = diag >= upv
        T = jnp.where(take_diag, diag, upv)
        tTS = jnp.where(take_diag, dTS, TS[:, :, 1:])
        tQS = jnp.where(take_diag, dQS, QS[:, :, 1:])
        floored = T < 0
        T = jnp.where(floored, 0, T)
        tTS = jnp.where(floored, jarr + 1, tTS)
        tQS = jnp.where(floored, i + 1, tQS)
        # in-row gap runs: prefix max of T[t] - gap*(j-t), payloads follow;
        # strict '>' keeps the non-shifted value on ties (later start wins)
        A = T + gap * jarr
        pTS, pQS = tTS, tQS
        d = 1
        while d < L:
            A_s = jnp.pad(A[:, :, :-d], ((0, 0), (0, 0), (d, 0)),
                          constant_values=NEG)
            TS_s = jnp.pad(pTS[:, :, :-d], ((0, 0), (0, 0), (d, 0)))
            QS_s = jnp.pad(pQS[:, :, :-d], ((0, 0), (0, 0), (d, 0)))
            better = A_s > A
            A = jnp.where(better, A_s, A)
            pTS = jnp.where(better, TS_s, pTS)
            pQS = jnp.where(better, QS_s, pQS)
            d *= 2
        newH = A - gap * jnp.arange(L, dtype=jnp.int32)[None, None, :]
        H = jnp.concatenate(
            [jnp.zeros((B, C, 1), dtype=jnp.int32), newH], axis=2)
        TS = jnp.concatenate(
            [jnp.zeros((B, C, 1), dtype=jnp.int32), pTS], axis=2)
        QS = jnp.concatenate(
            [jnp.zeros((B, C, 1), dtype=jnp.int32), pQS], axis=2)
        upd = newH > colmax
        colmax = jnp.where(upd, newH, colmax)
        qend_b = jnp.where(upd, i, qend_b)
        ts_b = jnp.where(upd, pTS, ts_b)
        qs_b = jnp.where(upd, pQS, qs_b)
        return (H, TS, QS, colmax, qend_b, ts_b, qs_b), None

    chars = adapters.T                                # (m, C)
    idxs = jnp.arange(m, dtype=jnp.int32)
    (_, _, _, colmax, qend_b, ts_b, qs_b), _ = jax.lax.scan(
        step, (H0, TS0, QS0, colmax0, pay0, ts_best0, qs_best0),
        (chars, idxs))

    # best hit per (B, C)
    j1 = jnp.argmax(colmax, axis=2).astype(jnp.int32)
    s1 = jnp.max(colmax, axis=2)
    take = lambda M: jnp.take_along_axis(M, j1[:, :, None], axis=2)[:, :, 0]
    qe1, ts1, qs1 = take(qend_b), take(ts_b), take(qs_b)
    # second hit: best end column whose alignment span [ts_b[j], j] is
    # (near-)disjoint from the best span — genuine second copies (dimers)
    # surface so the exactly-one-hit rule rejects the read, as BLAT's
    # every-PSL-row accounting does (C3POa_postprocessing.py:238-264),
    # while shifted self-alignments of the same occurrence stay suppressed
    del adapter_lens  # alignment spans, not adapter length, bound the mask
    jj = jnp.arange(L, dtype=jnp.int32)[None, None, :]
    overlap = jnp.minimum(jj, j1[:, :, None]) - \
        jnp.maximum(ts_b, ts1[:, :, None]) + 1
    masked = jnp.where(overlap > OVERLAP_TOL, NEG, colmax)
    s2 = jnp.max(masked, axis=2)
    return s1, j1, qe1, ts1, qs1, s2
