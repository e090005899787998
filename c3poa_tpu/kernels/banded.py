"""Batched banded affine-gap semiglobal aligner (device kernel).

The consensus workhorse replacing abPOA + racon's inner alignments
(see ``ref/banded.py`` for the full DP spec this implements band-locally).

Layout: band-local state — row i stores band offsets k in [0, W) covering
target DP columns j = lo(i) + k with lo(i) following the length-interpolated
diagonal.  The scan axis is the query length; each step is elementwise work
plus one log-depth prefix max (the exact F-gap resolution) on a (P, W)
block, batched over P (query, target) pairs.

Emits per-cell move bytes (same encoding as ref.banded: bits 0-1 H-source
diag/E/F, bit 2 E-extend, bit 3 F-extend) for host-side traceback; scores
and end columns are computed on device.

Pairs are padded to (nq_max, nt_max); rows beyond a pair's query length
freeze the DP state so the final state is that pair's last real row.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-(2 ** 28))


def band_starts_np(nq: int, nt: int, band: int) -> np.ndarray:
    """Host-side lo(i) (must equal the device computation bit-for-bit)."""
    i = np.arange(nq + 1, dtype=np.float32)
    ctr = np.round(i * np.float32(nt) / np.float32(max(nq, 1))).astype(np.int32)
    hi = max(nt + 1 - band, 0)
    return np.clip(ctr - band // 2, 0, hi)


@partial(jax.jit, static_argnames=("band", "match", "mismatch",
                                   "gap_open", "gap_ext"))
def banded_align_batch(queries: jax.Array, targets: jax.Array,
                       q_lens: jax.Array, t_lens: jax.Array,
                       band: int = 128, match: int = 5, mismatch: int = -4,
                       gap_open: int = 4, gap_ext: int = 2):
    """queries: (P, nq_max) int8 pad 4; targets: (P, nt_max) int8 pad 4.

    Returns (scores (P,) int32, j_end (P,) int32,
             moves (P, nq_max, W) uint8) — moves row r holds DP row r+1.
    """
    P, nq_max = queries.shape
    _, nt_max = targets.shape
    W = band
    oe = jnp.int32(gap_open + gap_ext)
    e = jnp.int32(gap_ext)
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    queries = queries.astype(jnp.int32)
    targets = targets.astype(jnp.int32)

    karr = jnp.arange(W, dtype=jnp.int32)[None, :]           # (1, W)
    hi = jnp.maximum(t_lens + 1 - W, 0)                      # (P,)

    def lo_of(i):
        i_eff = jnp.minimum(i, q_lens).astype(jnp.float32)
        ctr = jnp.round(i_eff * t_lens.astype(jnp.float32) /
                        jnp.maximum(q_lens, 1).astype(jnp.float32))
        return jnp.clip(ctr.astype(jnp.int32) - W // 2, 0, hi)  # (P,)

    lo0 = lo_of(jnp.int32(0))
    in_band0 = (lo0[:, None] + karr) <= t_lens[:, None]
    H0 = jnp.where(in_band0, 0, NEG)
    E0 = jnp.full((P, W), NEG, dtype=jnp.int32)

    def gather_shift(M, s, delta):
        """M[p, k + s[p] + delta] with NEG outside [0, W)."""
        idx = karr + s[:, None] + delta
        ok = (idx >= 0) & (idx < W)
        g = jnp.take_along_axis(M, jnp.clip(idx, 0, W - 1), axis=1)
        return jnp.where(ok, g, NEG)

    def step(carry, i):
        H_prev, E_prev, lo_prev = carry
        lo_i = lo_of(i)
        s = lo_i - lo_prev                                   # (P,) >= 0
        Hp = gather_shift(H_prev, s, 0)
        Ep = gather_shift(E_prev, s, 0)
        Hd = gather_shift(H_prev, s, -1)

        jcol = lo_i[:, None] + karr                          # (P, W)
        qi = jnp.clip(i - 1, 0, nq_max - 1)
        qc = jax.lax.dynamic_slice_in_dim(queries, qi, 1, axis=1)  # (P, 1)
        tc = jnp.take_along_axis(
            targets, jnp.clip(jcol - 1, 0, nt_max - 1), axis=1)
        sub = jnp.where((qc == 4) | (tc == 4), 0,
                        jnp.where(qc == tc, match, mismatch))

        E = jnp.maximum(Hp - oe, Ep - e)
        eext = (Ep - e) > (Hp - oe)
        diag = jnp.where(jcol >= 1, Hd + sub, NEG)
        Ht = jnp.maximum(diag, E)
        # F[k] = max_{u<k}(Ht[u] - oe - e*(k-1-u)) via prefix max
        A = Ht + e * karr
        cm = jax.lax.associative_scan(jnp.maximum, A, axis=1)
        F = jnp.concatenate(
            [jnp.full((P, 1), NEG, dtype=jnp.int32), cm[:, :-1]], axis=1) \
            - oe - e * karr + e
        fext = jnp.concatenate(
            [jnp.zeros((P, 1), dtype=bool),
             (F[:, :-1] - e) > (Ht[:, :-1] - oe)], axis=1)
        H = jnp.maximum(Ht, F)
        src = jnp.where((diag >= E) & (diag >= F), 0,
                        jnp.where(E >= F, 1, 2)).astype(jnp.uint8)
        mv = src | (eext.astype(jnp.uint8) << 2) | (fext.astype(jnp.uint8) << 3)

        in_band = jcol <= t_lens[:, None]
        H = jnp.where(in_band, H, NEG)
        E = jnp.where(in_band, E, NEG)
        mv = jnp.where(in_band, mv, 0)

        active = (i <= q_lens)[:, None]
        H = jnp.where(active, H, Hp)
        E = jnp.where(active, E, Ep)
        return (H, E, lo_i), mv

    steps = jnp.arange(1, nq_max + 1, dtype=jnp.int32)
    (Hf, _Ef, lof), moves = jax.lax.scan(step, (H0, E0, lo0), steps)
    moves = jnp.transpose(moves, (1, 0, 2))                  # (P, nq_max, W)

    score = jnp.max(Hf, axis=1)
    k_end = jnp.argmax(Hf, axis=1).astype(jnp.int32)
    j_end = lof + k_end
    return score, j_end, moves


def traceback_banded(q: np.ndarray, t: np.ndarray, moves: np.ndarray,
                     j_end: int, band: int):
    """Host traceback of band-local move bytes -> ref.banded.AlignRecord.

    moves: (nq_max, W) uint8 from ``banded_align_batch`` (row r = DP row
    r+1).  A C fast path implements the same walk in native/traceback.c.
    """
    from ..ref.banded import AlignRecord, BIT_EEXT, BIT_FEXT, SRC_DIAG, SRC_E

    nq, nt = len(q), len(t)
    lo = band_starts_np(nq, nt, band)
    cover = np.zeros(nt, dtype=np.int8)
    base = np.full(nt, 4, dtype=np.int8)
    qpos = np.full(nt, -1, dtype=np.int32)
    ins_len = np.zeros(nt + 1, dtype=np.int32)
    ins_qstart = np.full(nt + 1, -1, dtype=np.int32)

    i, j = nq, int(j_end)
    state = 0
    while i > 0:
        k = j - lo[i]
        mv = int(moves[i - 1, k])
        if state == 0:
            src = mv & 3
            if src == SRC_DIAG:
                cover[j - 1] = 1
                base[j - 1] = q[i - 1]
                qpos[j - 1] = i - 1
                i -= 1
                j -= 1
            elif src == SRC_E:
                state = 1
            else:
                state = 2
        elif state == 1:
            ins_len[j] += 1
            ins_qstart[j] = i - 1
            ext = mv & BIT_EEXT
            i -= 1
            if not ext:
                state = 0
        else:
            cover[j - 1] = 2
            ext = mv & BIT_FEXT
            j -= 1
            if not ext:
                state = 0
    return AlignRecord(cover, base, qpos, ins_len, ins_qstart, j, int(j_end),
                       score=0)
