"""Pallas TPU forward kernel for the banded affine semiglobal aligner.

Bit-identical to kernels/banded.py:banded_align_batch (the ref/banded.py
spec); the XLA scan version spends ~95% of its time on per-step overhead
and small gathers, while this kernel keeps all DP state in registers/VMEM.

Mosaic has no dynamic *lane* indexing, so the two per-row dynamic accesses
are restructured:
- the query char of row i (same i for every pair) comes from one dynamic
  roll of the (P_TILE, nq) query block;
- the per-pair band target window lives in a carried (P_TILE, W + STAGE)
  buffer, shifted by the per-pair band advance s in {0..SMAX} via selects
  over static shifts, and restocked every REFILL_EVERY rows with per-pair
  dynamic rolls of the full target row (each pair's target fits VMEM).

Outputs match banded_align_batch: scores, j_end, and the (P, nq, W) move
bytes (written per row; the on-device ops walk from kernels/banded.py
consumes them unchanged).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import SMAX

NEG = -(2 ** 28)

P_TILE = 8
STAGE = 132          # staged lookahead chars beyond the window
REFILL_EVERY = 32    # rows between stage restocks (consumes <= 3*32 = 96)


def _sel_shift(M, s, delta, fill):
    """M[:, k + s + delta] for per-row s in [0, SMAX]; static shifts only."""
    out = None
    for v in range(SMAX + 1):
        d = v + delta
        if d >= 0:
            sh = jnp.pad(M[:, d:], ((0, 0), (0, d)), constant_values=fill)
        else:
            sh = jnp.pad(M[:, :d], ((0, 0), (-d, 0)), constant_values=fill)
        out = sh if out is None else jnp.where(s == v, sh, out)
    return out


def _kernel(ql_ref, tl_ref, q_ref, t_ref, mv_ref, score_ref, jend_ref,
            *, match, mismatch, gap_open, gap_ext, W, nq, nt, levels):
    oe = gap_open + gap_ext
    e = gap_ext
    ql = ql_ref[:].astype(jnp.int32)          # (P_t, 1)
    tl = tl_ref[:].astype(jnp.int32)
    karr = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, W), 1)
    hi = jnp.maximum(tl + 1 - W, 0)
    Q = q_ref[:].astype(jnp.int32)            # (P_t, nq)
    T = t_ref[:].astype(jnp.int32)            # (P_t, nt)

    def lo_of(i):
        i_eff = jnp.minimum(i, ql).astype(jnp.float32)
        ctr = jnp.round(i_eff * tl.astype(jnp.float32) /
                        jnp.maximum(ql, 1).astype(jnp.float32))
        return jnp.clip(ctr.astype(jnp.int32) - W // 2, 0, hi)   # (P_t, 1)

    def refill(buf, lo_i):
        """Restock buf[:, W:] with t[a + W .. a + W + STAGE), a = lo_i - 1."""
        rows = []
        for p in range(P_TILE):
            a_p = lo_i[p, 0] - 1
            start = a_p + W
            sh = (nt - start % nt) % nt
            rolled = pltpu.roll(T[p:p + 1, :], shift=sh, axis=1)
            rows.append(rolled[:, :STAGE])
        stage = jnp.concatenate(rows, axis=0)                    # (P_t, STAGE)
        # chars at/after t_len present as pad (4)
        off = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, STAGE), 1)
        pos = (lo_i - 1 + W) + off
        stage = jnp.where((pos < 0) | (pos >= tl), 4, stage)
        return jnp.concatenate([buf[:, :W], stage], axis=1)

    lo0 = lo_of(jnp.int32(0))
    in_band0 = (lo0 + karr) <= tl
    H0 = jnp.where(in_band0, 0, NEG)
    E0 = jnp.full((P_TILE, W), NEG, dtype=jnp.int32)
    # initial window anchor a = lo(0) - 1 = -1: [pad | t[0:W+STAGE-1]]
    buf0 = jnp.concatenate(
        [jnp.full((P_TILE, 1), 4, dtype=jnp.int32), T[:, :W + STAGE - 1]],
        axis=1)

    def row(i, carry):
        H_prev, E_prev, buf, lo_prev, mv_buf = carry
        lo_i = lo_of(i)
        s = lo_i - lo_prev                                       # (P_t, 1)
        Hp = _sel_shift(H_prev, s, 0, NEG)
        Ep = _sel_shift(E_prev, s, 0, NEG)
        Hd = _sel_shift(H_prev, s, -1, NEG)
        buf = _sel_shift(buf, s, 0, 4)
        buf = jax.lax.cond((i - 1) % REFILL_EVERY == 0,
                           lambda: refill(buf, lo_i), lambda: buf)

        qsh = (nq - (i - 1) % nq) % nq
        qc = pltpu.roll(Q, shift=qsh, axis=1)[:, 0:1]            # (P_t, 1)
        tc = buf[:, :W]
        sub = jnp.where((qc == 4) | (tc == 4), 0,
                        jnp.where(qc == tc, match, mismatch))

        jcol = lo_i + karr
        E = jnp.maximum(Hp - oe, Ep - e)
        eext = (Ep - e) > (Hp - oe)
        diag = jnp.where(jcol >= 1, Hd + sub, NEG)
        Ht = jnp.maximum(diag, E)
        A = Ht + e * karr
        d = 1
        for _ in range(levels):
            sh = pltpu.roll(A, shift=d, axis=1)
            sh = jnp.where(karr >= d, sh, NEG)
            A = jnp.maximum(A, sh)
            d *= 2
        F = jnp.where(karr >= 1,
                      pltpu.roll(A, shift=1, axis=1) - oe - e * karr + e,
                      NEG)
        fprev = jnp.where(karr >= 1, pltpu.roll(F, shift=1, axis=1), NEG)
        htprev = jnp.where(karr >= 1, pltpu.roll(Ht, shift=1, axis=1), NEG)
        fext = (karr >= 1) & ((fprev - e) > (htprev - oe))
        H = jnp.maximum(Ht, F)
        src = jnp.where((diag >= E) & (diag >= F), 0,
                        jnp.where(E >= F, 1, 2))
        mv = (src | (eext.astype(jnp.int32) << 2) |
              (fext.astype(jnp.int32) << 3))

        in_band = jcol <= tl
        H = jnp.where(in_band, H, NEG)
        E = jnp.where(in_band, E, NEG)
        mv = jnp.where(in_band, mv, 0)

        active = i <= ql
        H = jnp.where(active, H, Hp)
        E = jnp.where(active, E, Ep)

        # int8 stores need sublane-aligned offsets: buffer 8 rows (as int32
        # registers — int8 mask-selects hit Mosaic relayout limits), flush
        # at multiples of 8
        row_sel = jax.lax.broadcasted_iota(
            jnp.int32, (P_TILE, 8, W), 1) == ((i - 1) % 8)
        mv_buf = jnp.where(row_sel, mv[:, None, :], mv_buf)

        @pl.when(i % 8 == 0)
        def _flush():
            base = pl.multiple_of(i - 8, 8)
            mv_ref[:, pl.ds(base, 8), :] = mv_buf.astype(jnp.uint8)

        return H, E, buf, lo_i, mv_buf

    mvb0 = jnp.zeros((P_TILE, 8, W), dtype=jnp.int32)
    Hf, _Ef, _buf, lof, _mvb = jax.lax.fori_loop(
        1, nq + 1, row, (H0, E0, buf0, lo0, mvb0))
    mx = jnp.max(Hf, axis=1, keepdims=True)
    score_ref[:] = mx
    # argmax (smallest k on ties); Mosaic's argmax only supports f32
    k_end = jnp.min(jnp.where(Hf == mx, karr, W), axis=1, keepdims=True)
    jend_ref[:] = lof + k_end


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap_open", "gap_ext", "interpret"))
def banded_fwd_pallas(queries, targets, q_lens, t_lens, band: int = 128,
                      match: int = 5, mismatch: int = -4, gap_open: int = 4,
                      gap_ext: int = 2, interpret: bool = False):
    """Forward pass: returns (scores (P,), j_end (P,), moves (P, nq, W))."""
    P, nq = queries.shape
    _, nt = targets.shape
    W = band
    assert P % P_TILE == 0
    min_nt = W + STAGE + 8
    if nt < min_nt:
        targets = jnp.pad(targets, ((0, 0), (0, min_nt - nt)),
                          constant_values=4)
        nt = min_nt

    levels = 1
    while (1 << levels) < W:
        levels += 1

    kernel = functools.partial(
        _kernel, match=match, mismatch=mismatch, gap_open=gap_open,
        gap_ext=gap_ext, W=W, nq=nq, nt=nt, levels=levels)
    ql = q_lens.astype(jnp.int32).reshape(P, 1)
    tl = t_lens.astype(jnp.int32).reshape(P, 1)
    nP = P // P_TILE
    moves, score, jend = pl.pallas_call(
        kernel,
        grid=(nP,),
        in_specs=[
            pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, nq), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, nt), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((P_TILE, nq, W), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda p: (p, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, nq, W), jnp.uint8),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
        ),
        interpret=interpret,
    )(ql, tl, queries, targets)
    return score[:, 0], jend[:, 0], moves
