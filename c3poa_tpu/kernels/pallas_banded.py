"""Pallas TPU forward kernel for the banded affine semiglobal aligner.

Bit-identical to kernels/banded.py:banded_align_batch (the ref/banded.py
spec).  The XLA scan's cost on this hardware is per-row overhead — its
per-row (P, R) refill gather alone costs ~0.14 us/element (gathers are
catastrophically slow on this TPU) and halving the band leaves its time
unchanged — while this kernel keeps all DP state in VMEM registers and
touches HBM only for the packed move words.

Design (v3, post-profiling):
- the fori_loop body is one 8-row BLOCK, not one row: the 8 rows are
  unrolled in Python, so the move-word nibble index is static per row
  (no pack selects/conds), the word closes exactly once per iteration,
  and loop fixed cost is amortized 8x.  (int16 state would halve the
  native-tile count again, but Mosaic on this toolchain cannot compile
  int16 max/roll/select.)
- p_tile pairs per grid step (32 shipped): every elementwise op covers
  p_tile/8 native (8, 128) tiles, diluting per-op fixed cost.
- the query char of row i comes from a carried (P_TILE, QW) window read
  at static lane u within the block, rolled 8 lanes per block, and
  restocked every QW rows with one roll of the full query block.
- the per-pair band target window lives in a carried
  (P_TILE, W + STAGE) buffer, shifted by the per-pair band advance
  s in {0..SMAX} via selects over static shifts and restocked once per
  block (<= SMAX * 8 = 24 staged chars consumed between restocks).
- Hp (the aligned previous row) is derived from Hd (the diagonal shift)
  with one static roll + lane fix instead of a second SMAX-way select.
- move nibbles pack 8 DP rows into one int32 word: the kernel writes
  (P, nq/8, W) int32 — 8x fewer stores and half the bytes of the uint8
  block — flushed in sublane-aligned groups of 8 words (64 DP rows).

``banded_align_trace_pallas`` chains this forward with the same
reverse-walk scan as banded_align_trace_batch reading the packed words,
so the pipeline consumes identical (scores, j_end, j_start, i_rem, ops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import SMAX, band_lo_fn

NEG = -(2 ** 28)

P_TILE = 16        # default pairs per grid step (see p_tile arg)
STAGE = 132          # staged lookahead chars beyond the window
QW = 128             # query-char window width / restock period (8 | QW)
# blocks between stage restocks: consumption <= SMAX * 8 * REFILL_BLOCKS
# chars, and pad chars entering at the stage tail need STAGE - 1 shifts to
# reach the window, so REFILL_BLOCKS * SMAX * 8 < STAGE must hold (4 * 24
# = 96 < 132).  The refill's per-pair rolls are the block body's most
# expensive op group, so amortizing them 4x is a measured win.
REFILL_BLOCKS = 4


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


def _kernel(ql_ref, tl_ref, q_ref, t_ref, mvp_ref, score_ref, jend_ref,
            H_s, E_s, buf_s, qbuf_s, lo_s, *, match, mismatch, gap_open,
            gap_ext, W, nq, nt, levels, P_TILE, RC8, NC, NH):
    oe = gap_open + gap_ext
    e = gap_ext
    HS = P_TILE // NH                         # pairs per interleaved state
    ql_t = ql_ref[:].astype(jnp.int32)        # (P_t, 1)
    tl_t = tl_ref[:].astype(jnp.int32)
    karr = jax.lax.broadcasted_iota(jnp.int32, (HS, W), 1)
    karr_t = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, W), 1)
    Q_t = q_ref[:].astype(jnp.int32)          # (P_t, nq)
    T_t = t_ref[:].astype(jnp.int32)          # (P_t, nt)
    ci = pl.program_id(1)                     # row-chunk index (sequential)

    # NH > 1 splits the tile into NH independent DP states whose rows are
    # interleaved in program order: each row's serial dependency chain
    # (shift -> max -> prefix-max) then overlaps the other states' issue
    # slots instead of stalling the VPU (the p_tile sweep decomposed the
    # block cost as ~8 us fixed chain latency + ~3 us per (8, 128) tile,
    # bounding the win at ~1.3x for NH=2).  Identical math per pair.
    halves = []
    for h in range(NH):
        sl = slice(h * HS, (h + 1) * HS)
        ql, tl, Q, T = ql_t[sl], tl_t[sl], Q_t[sl], T_t[sl]
        halves.append((ql, tl, Q, T, band_lo_fn(ql, tl, W)))

    def _cat(parts, axis=0):
        return parts[0] if NH == 1 else jnp.concatenate(parts, axis=axis)

    def refill(h, buf, lo_i):
        """Restock buf[:, W:] with t[a + W .. a + W + STAGE), a = lo_i - 1."""
        ql, tl, Q, T, lo_of = halves[h]
        rows = []
        for p in range(HS):
            a_p = lo_i[p, 0] - 1
            start = a_p + W
            sh = (nt - start % nt) % nt
            rolled = pltpu.roll(T[p:p + 1, :], shift=sh, axis=1)
            rows.append(rolled[:, :STAGE])
        stage = jnp.concatenate(rows, axis=0) if HS > 1 else rows[0]
        # chars at/after t_len present as pad (4)
        off = jax.lax.broadcasted_iota(jnp.int32, (HS, STAGE), 1)
        pos = (lo_i - 1 + W) + off
        stage = jnp.where((pos < 0) | (pos >= tl), 4, stage)
        return jnp.concatenate([buf[:, :W], stage], axis=1)

    # chunk 0 initializes the carried DP state; later chunks resume it
    # from VMEM scratch (grid dim 1 is sequential / "arbitrary")
    @pl.when(ci == 0)
    def _init():
        lo0 = band_lo_fn(ql_t, tl_t, W)(jnp.int32(0))
        in_band0 = (lo0 + karr_t) <= tl_t
        H_s[:] = jnp.where(in_band0, 0, NEG)
        E_s[:] = jnp.full((P_TILE, W), NEG, dtype=jnp.int32)
        # initial window anchor a = lo(0) - 1 = -1: [pad | t[0:W+STAGE-1]]
        buf_s[:] = jnp.concatenate(
            [jnp.full((P_TILE, 1), 4, dtype=jnp.int32),
             T_t[:, :W + STAGE - 1]], axis=1)
        qbuf_s[:] = Q_t[:, :QW]
        lo_s[:] = lo0

    def row_step(h, u, i0, b, st):
        H, E, buf, qbuf, lo_prev, pack = st
        ql, tl, Q, T, lo_of = halves[h]
        i = i0 + u
        lo_i = lo_of(i)
        s = lo_i - lo_prev                                   # (HS, 1)
        Hd = _sel_shift(H, s, -1, NEG)
        # Hp[k] = H[k+s] = Hd[k+1] for k < W-1; lane W-1 is only
        # reachable when s == 0
        Hp = jnp.where(karr == W - 1,
                       jnp.where(s == 0, H[:, W - 1:W], NEG),
                       pltpu.roll(Hd, shift=W - 1, axis=1))
        Ep = _sel_shift(E, s, 0, NEG)
        buf = _sel_shift(buf, s, 0, 4)
        if u == 0:
            # restock the staged target chars every REFILL_BLOCKS
            # blocks (consumes <= SMAX * 8 * REFILL_BLOCKS < STAGE
            # between restocks)
            buf = jax.lax.cond(b % REFILL_BLOCKS == 0,
                               lambda: refill(h, buf, lo_i), lambda: buf)
        qc = qbuf[:, u:u + 1]                                # (HS, 1)
        tc = buf[:, :W]
        sub = jnp.where((qc == 4) | (tc == 4), 0,
                        jnp.where(qc == tc, match, mismatch))

        jcol = lo_i + karr
        En = jnp.maximum(Hp - oe, Ep - e)
        eext = (Ep - e) > (Hp - oe)
        diag = jnp.where(jcol >= 1, Hd + sub, NEG)
        Ht = jnp.maximum(diag, En)
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
        htprev = jnp.where(karr >= 1, pltpu.roll(Ht, shift=1, axis=1),
                           NEG)
        fext = (karr >= 1) & ((fprev - e) > (htprev - oe))
        Hn = jnp.maximum(Ht, F)
        src = jnp.where((diag >= En) & (diag >= F), 0,
                        jnp.where(En >= F, 1, 2))
        mv = (src | (eext.astype(jnp.int32) << 2) |
              (fext.astype(jnp.int32) << 3))

        in_band = jcol <= tl
        Hn = jnp.where(in_band, Hn, NEG)
        En = jnp.where(in_band, En, NEG)
        mv = jnp.where(in_band, mv, 0)

        active = i <= ql
        H = jnp.where(active, Hn, Hp)
        E = jnp.where(active, En, Ep)

        # nibble u of the block's move word — static shift, no select
        pack = mv if u == 0 else pack | (mv << (4 * u))
        return H, E, buf, qbuf, lo_i, pack

    # One fori_loop step = one 8-row block = one finished move word:
    # the nibble index is static per unrolled row (no per-row pack
    # selects or conds), the move word never crosses iterations, and
    # per-row loop fixed cost is amortized 8x (measured ~9% on the
    # shipped (2048, 2048, 128) batch vs the row-at-a-time loop).
    def block(b, carry):
        i0 = 8 * b + 1
        sts = []
        for h in range(NH):
            H, E, buf, qbuf, lo_prev, grp = carry[h]
            Qh = halves[h][2]

            def fresh_q(Qh=Qh):
                qsh = (nq - (i0 - 1) % nq) % nq
                return pltpu.roll(Qh, shift=qsh, axis=1)[:, :QW]

            qbuf = jax.lax.cond((i0 - 1) % QW == 0, fresh_q, lambda: qbuf)
            # invariant: qbuf[:, u] == q[i0 - 1 + u] for u in [0, 8)
            sts.append((H, E, buf, qbuf, lo_prev,
                        jnp.zeros((HS, W), dtype=jnp.int32)))

        for u in range(8):
            for h in range(NH):
                sts[h] = row_step(h, u, i0, b, sts[h])

        # insert the finished word(s) into the 8-word flush group
        slot = b % 8
        sel = jax.lax.broadcasted_iota(jnp.int32, (HS, 8, W), 1) == slot
        out = []
        grps = []
        for h in range(NH):
            H, E, buf, qbuf, lo_prev, pack = sts[h]
            grp = jnp.where(sel, pack[:, None, :], carry[h][5])
            grps.append(grp)
            qbuf = pltpu.roll(qbuf, shift=QW - 8, axis=1)
            out.append((H, E, buf, qbuf, lo_prev, grp))

        @pl.when(slot == 7)
        def _flush():
            # chunk-local word index: this chunk's out block covers
            # words [ci * RC8, (ci + 1) * RC8)
            base = pl.multiple_of(b - 7 - ci * RC8, 8)
            mvp_ref[:, pl.ds(base, 8), :] = _cat(grps)

        return tuple(out)

    # dynamic trip count: pairs are packed into tiles sorted by length,
    # so the tile's longest query bounds the rows that can change state
    # (rows beyond ql freeze H/E and lo_of saturates at ql).  Rounded up
    # to whole 8-word flush groups so the last group still flushes.
    nb = jnp.minimum((jnp.max(ql_t) + 7) // 8, nq // 8)
    nb8 = ((nb + 7) // 8) * 8
    # this chunk's share of the blocks (RC8 is a multiple of 8, so flush
    # groups never straddle chunks)
    b_st = ci * RC8
    b_en = jnp.clip(nb8, b_st, b_st + RC8)
    H0, E0, buf0, qbuf0, lo0 = (H_s[:], E_s[:], buf_s[:], qbuf_s[:], lo_s[:])
    grp0 = jnp.zeros((HS, 8, W), dtype=jnp.int32)
    carry0 = tuple(
        (H0[h * HS:(h + 1) * HS], E0[h * HS:(h + 1) * HS],
         buf0[h * HS:(h + 1) * HS], qbuf0[h * HS:(h + 1) * HS],
         lo0[h * HS:(h + 1) * HS], grp0)
        for h in range(NH))
    fin = jax.lax.fori_loop(b_st, b_en, block, carry0)
    Hf = _cat([fin[h][0] for h in range(NH)])
    lof = _cat([fin[h][4] for h in range(NH)])
    H_s[:], E_s[:] = Hf, _cat([fin[h][1] for h in range(NH)])
    buf_s[:] = _cat([fin[h][2] for h in range(NH)])
    qbuf_s[:] = _cat([fin[h][3] for h in range(NH)])
    lo_s[:] = lof

    @pl.when(ci == NC - 1)
    def _final():
        mx = jnp.max(Hf, axis=1, keepdims=True)
        score_ref[:] = mx
        # argmax (smallest k on ties); Mosaic's argmax only supports f32
        k_end = jnp.min(jnp.where(Hf == mx, karr_t, W), axis=1,
                        keepdims=True)
        jend_ref[:] = lof + k_end


def _kernel_sb(ql_ref, tl_ref, q_ref, t_ref, mvp_ref, score_ref, jend_ref,
               H_s, E_s, buf_s, lo_s, *, match, mismatch, gap_open,
               gap_ext, W, nq, nt, levels, P_TILE, RC8, NC, FOLD, EARLY):
    """Super-block variant of ``_kernel``: the fori_loop body is EIGHT
    8-row blocks (64 rows) unrolled, with every per-block conditional
    turned static:

    - the query window is restocked once per super-block with one
      dynamic roll and read at static lanes (no per-block lax.cond and
      no per-block qbuf roll);
    - the staged-target refill runs unconditionally at local blocks 0
      and 4 (the same every-4-blocks cadence, minus the cond);
    - the 8 finished move words are stacked and stored once per
      super-block (no per-block (P,8,W) slot-select, no pl.when flush).

    This attacks the measured ~8 us FIXED per-block serial cost the
    p_tile sweep isolated (BENCHMARKS.md): loop/cond/select machinery,
    not DP math.  Identical math and word layout to ``_kernel``;
    bit-parity tested in interpret mode and byte-parity gated on
    hardware (tools/hwcheck.py C3POA_ALIGN_SB=0,1)."""
    oe = gap_open + gap_ext
    e = gap_ext
    ql = ql_ref[:].astype(jnp.int32)          # (P_t, 1)
    tl = tl_ref[:].astype(jnp.int32)
    karr = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, W), 1)
    Q = q_ref[:].astype(jnp.int32)            # (P_t, nq)
    T = t_ref[:].astype(jnp.int32)            # (P_t, nt)
    ci = pl.program_id(1)                     # row-chunk index (sequential)
    lo_of = band_lo_fn(ql, tl, W)

    def refill(buf, lo_i):
        """Restock buf[:, W:] with t[a + W .. a + W + STAGE), a = lo_i - 1."""
        rows = []
        for p in range(P_TILE):
            a_p = lo_i[p, 0] - 1
            start = a_p + W
            sh = (nt - start % nt) % nt
            rolled = pltpu.roll(T[p:p + 1, :], shift=sh, axis=1)
            rows.append(rolled[:, :STAGE])
        stage = jnp.concatenate(rows, axis=0) if P_TILE > 1 else rows[0]
        off = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, STAGE), 1)
        pos = (lo_i - 1 + W) + off
        stage = jnp.where((pos < 0) | (pos >= tl), 4, stage)
        return jnp.concatenate([buf[:, :W], stage], axis=1)

    @pl.when(ci == 0)
    def _init():
        lo0 = band_lo_fn(ql, tl, W)(jnp.int32(0))
        in_band0 = (lo0 + karr) <= tl
        H_s[:] = jnp.where(in_band0, 0, NEG)
        E_s[:] = jnp.full((P_TILE, W), NEG, dtype=jnp.int32)
        buf_s[:] = jnp.concatenate(
            [jnp.full((P_TILE, 1), 4, dtype=jnp.int32),
             T[:, :W + STAGE - 1]], axis=1)
        lo_s[:] = lo0

    def row_step(i, qc, st, do_refill):
        H, E, buf, lo_prev = st
        lo_i = lo_of(i)
        s = lo_i - lo_prev                                   # (P_t, 1)
        if FOLD:
            # one fused shift of [H | E | buf] instead of three
            # _sel_shifts: 1/3 the op count on ~equal tile traffic —
            # pays when per-op Mosaic overhead dominates (it did for
            # the profile kernel's fat tiles).  Seam lanes (k >= W - s)
            # received the next segment's head and are re-masked to the
            # out-of-band fill; Hd is recovered from the fused Hp with
            # one roll + a lane-0 fix (H[s-1] via a 3-way (P,1) select).
            M = jnp.concatenate([H, E, buf], axis=1)
            Ms = _sel_shift(M, s, 0, 4)
            seam = karr >= (W - s)
            Hp = jnp.where(seam, NEG, Ms[:, :W])
            Ep = jnp.where(seam, NEG, Ms[:, W:2 * W])
            buf = Ms[:, 2 * W:]
            lane0 = jnp.where(s == 1, M[:, 0:1],
                              jnp.where(s == 2, M[:, 1:2],
                                        jnp.where(s == 3, M[:, 2:3], NEG)))
            Hd = jnp.where(karr == 0, lane0,
                           pltpu.roll(Hp, shift=1, axis=1))
        else:
            Hd = _sel_shift(H, s, -1, NEG)
            Hp = jnp.where(karr == W - 1,
                           jnp.where(s == 0, H[:, W - 1:W], NEG),
                           pltpu.roll(Hd, shift=W - 1, axis=1))
            Ep = _sel_shift(E, s, 0, NEG)
            buf = _sel_shift(buf, s, 0, 4)
        if do_refill:
            buf = refill(buf, lo_i)
        tc = buf[:, :W]
        sub = jnp.where((qc == 4) | (tc == 4), 0,
                        jnp.where(qc == tc, match, mismatch))

        jcol = lo_i + karr
        En = jnp.maximum(Hp - oe, Ep - e)
        eext = (Ep - e) > (Hp - oe)
        diag = jnp.where(jcol >= 1, Hd + sub, NEG)
        Ht = jnp.maximum(diag, En)
        A = Ht + e * karr
        if EARLY:
            # convergence early-exit on the F prefix-max: lane-crossing
            # rolls cost ~74 ns EACH on this VPU (dependent chain,
            # tools/mosaic_floor_probe.py) and the 7 doubling levels are
            # the row chain's biggest block; a pass that changes nothing
            # proves every later pass is a no-op (same argument as
            # pallas_profile's early mode), and real F-gap runs at
            # nanopore error rates converge in 2-3 levels.
            # Bit-identical by construction.
            def _cond(st):
                d_, _A, changed = st
                return jnp.logical_and(d_ < W, changed)

            def _body(st):
                d_, A_, _ = st
                sh = pltpu.roll(A_, shift=d_, axis=1)
                sh = jnp.where(karr >= d_, sh, NEG)
                A2 = jnp.maximum(A_, sh)
                return d_ * 2, A2, jnp.any(A2 != A_)

            _, A, _ = jax.lax.while_loop(
                _cond, _body, (jnp.int32(1), A, jnp.bool_(True)))
        else:
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
        htprev = jnp.where(karr >= 1, pltpu.roll(Ht, shift=1, axis=1),
                           NEG)
        fext = (karr >= 1) & ((fprev - e) > (htprev - oe))
        Hn = jnp.maximum(Ht, F)
        src = jnp.where((diag >= En) & (diag >= F), 0,
                        jnp.where(En >= F, 1, 2))
        mv = (src | (eext.astype(jnp.int32) << 2) |
              (fext.astype(jnp.int32) << 3))

        in_band = jcol <= tl
        Hn = jnp.where(in_band, Hn, NEG)
        En = jnp.where(in_band, En, NEG)
        mv = jnp.where(in_band, mv, 0)

        active = i <= ql
        H = jnp.where(active, Hn, Hp)
        E = jnp.where(active, En, Ep)
        return (H, E, buf, lo_i), mv

    def sblock(sb, carry):
        i0 = 64 * sb + 1
        # invariant: qbuf[:, v] == q[i0 - 1 + v] for v in [0, 64)
        qsh = (nq - (64 * sb) % nq) % nq
        qbuf = pltpu.roll(Q, shift=qsh, axis=1)[:, :64]
        st = carry
        packs = []
        for bl in range(8):
            pack = None
            for u in range(8):
                v = 8 * bl + u
                st, mv = row_step(i0 + v, qbuf[:, v:v + 1], st,
                                  do_refill=(u == 0 and bl % 4 == 0))
                pack = mv if u == 0 else pack | (mv << (4 * u))
            packs.append(pack)
        base = pl.multiple_of(8 * sb - ci * RC8, 8)
        mvp_ref[:, pl.ds(base, 8), :] = jnp.stack(packs, axis=1)
        return st

    nb = jnp.minimum((jnp.max(ql) + 7) // 8, nq // 8)
    nb8 = ((nb + 7) // 8) * 8
    b_st = ci * RC8
    b_en = jnp.clip(nb8, b_st, b_st + RC8)
    carry0 = (H_s[:], E_s[:], buf_s[:], lo_s[:])
    Hf, Ef, buff, lof = jax.lax.fori_loop(b_st // 8, b_en // 8, sblock,
                                          carry0)
    H_s[:], E_s[:], buf_s[:], lo_s[:] = Hf, Ef, buff, lof

    @pl.when(ci == NC - 1)
    def _final():
        mx = jnp.max(Hf, axis=1, keepdims=True)
        score_ref[:] = mx
        k_end = jnp.min(jnp.where(Hf == mx, karr, W), axis=1,
                        keepdims=True)
        jend_ref[:] = lof + k_end


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap_open", "gap_ext", "interpret",
    "p_tile", "nh", "superblock", "fold", "vmem_mb", "early"))
def banded_fwd_pallas_packed(queries, targets, q_lens, t_lens,
                             band: int = 128, match: int = 5,
                             mismatch: int = -4, gap_open: int = 4,
                             gap_ext: int = 2, interpret: bool = False,
                             p_tile: int = P_TILE, nh: int = 1,
                             superblock: bool = False, fold: bool = False,
                             vmem_mb: int = 0, early: bool = False):
    """Forward pass: returns (scores (P,), j_end (P,),
    packed moves (P, nq_pad/8, W) int32 — row i's move byte is nibble
    (i-1) % 8 of word (i-1)//8).

    ``nh``: number of independent interleaved DP states per tile
    (software pipelining of the serial dependency chain); each state
    must keep whole (8, 128) sublanes, so p_tile % (8 * nh) == 0."""
    P, nq = queries.shape
    _, nt = targets.shape
    W = band
    P_TILE = p_tile
    P_orig = P
    if P % P_TILE:
        padP = P_TILE - P % P_TILE
        queries = jnp.pad(queries, ((0, padP), (0, 0)), constant_values=4)
        targets = jnp.pad(targets, ((0, padP), (0, 0)), constant_values=4)
        q_lens = jnp.pad(jnp.asarray(q_lens), (0, padP), constant_values=1)
        t_lens = jnp.pad(jnp.asarray(t_lens), (0, padP), constant_values=1)
        P += padP
    # row-chunked grid: the move-word out block is (P_TILE, RC8, W) per
    # chunk instead of (P_TILE, nq/8, W), so VMEM pressure is independent
    # of nq (the monolithic block OOMed scoped VMEM at nq >= 6144) and
    # larger p_tile fits.  DP state carries across chunks in VMEM scratch
    # (grid dims are sequential on TPU).  The chunk is the largest
    # multiple of 64 <= 512 dividing the 64-rounded nq, so small buckets
    # never pad up to 512 (the ladder's 1.5x buckets land on 384/512).
    nq64 = -(-nq // 64) * 64
    if nq64 <= 512:
        RCHUNK = nq64
    else:
        RCHUNK = 64
        for d in range(512, 63, -64):
            if nq64 % d == 0:
                RCHUNK = d
                break
    if nq != nq64:
        queries = jnp.pad(queries, ((0, 0), (0, nq64 - nq)),
                          constant_values=4)
        nq = nq64
    min_nt = W + STAGE + 8
    if nt < min_nt:
        targets = jnp.pad(targets, ((0, 0), (0, min_nt - nt)),
                          constant_values=4)
        nt = min_nt

    levels = 1
    while (1 << levels) < W:
        levels += 1

    RC8 = RCHUNK // 8
    NC = nq // RCHUNK
    if P_TILE % (8 * nh):
        raise ValueError(f"p_tile {P_TILE} not divisible by 8*nh ({8 * nh})")
    ql = q_lens.astype(jnp.int32).reshape(P, 1)
    tl = t_lens.astype(jnp.int32).reshape(P, 1)
    nP = P // P_TILE
    nq8 = nq // 8
    common = dict(match=match, mismatch=mismatch, gap_open=gap_open,
                  gap_ext=gap_ext, W=W, nq=nq, nt=nt, levels=levels,
                  P_TILE=P_TILE, RC8=RC8, NC=NC)
    scratch = [
        pltpu.VMEM((P_TILE, W), jnp.int32),            # H
        pltpu.VMEM((P_TILE, W), jnp.int32),            # E
        pltpu.VMEM((P_TILE, W + STAGE), jnp.int32),    # target window
    ]
    if superblock:
        # super-blocks are 64 rows; RCHUNK is a multiple of 64, so chunk
        # boundaries always align and the query window needs no
        # cross-chunk carry
        kernel = functools.partial(_kernel_sb, FOLD=fold, EARLY=early,
                                   **common)
        scratch += [pltpu.VMEM((P_TILE, 1), jnp.int32)]            # lo_prev
    else:
        kernel = functools.partial(_kernel, NH=nh, **common)
        scratch += [pltpu.VMEM((P_TILE, QW), jnp.int32),   # query window
                    pltpu.VMEM((P_TILE, 1), jnp.int32)]    # lo_prev
    # scoped-VMEM ceiling: Mosaic defaults to 16 MB, which binds p_tile
    # at 64 (48 with fold) — the physical VMEM is larger, so a raised
    # limit lets fatter tiles (more pairs per op issue) be A/B'd on
    # hardware.  0 = compiler default.
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)
               if vmem_mb else None)
    mvp, score, jend = pl.pallas_call(
        kernel,
        grid=(nP, NC),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((P_TILE, 1), lambda p, c: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda p, c: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, nq), lambda p, c: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, nt), lambda p, c: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((P_TILE, RC8, W), lambda p, c: (p, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda p, c: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_TILE, 1), lambda p, c: (p, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, nq8, W), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(ql, tl, queries, targets)
    return score[:P_orig, 0], jend[:P_orig, 0], mvp[:P_orig]


def banded_fwd_pallas(queries, targets, q_lens, t_lens, band: int = 128,
                      match: int = 5, mismatch: int = -4, gap_open: int = 4,
                      gap_ext: int = 2, interpret: bool = False,
                      p_tile: int = P_TILE, nh: int = 1,
                      superblock: bool = False, fold: bool = False):
    """Compatibility wrapper: unpacked (P, nq, W) uint8 moves (tests)."""
    P, nq = queries.shape
    score, jend, mvp = banded_fwd_pallas_packed(
        queries, targets, q_lens, t_lens, band=band, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        interpret=interpret, p_tile=p_tile, nh=nh, superblock=superblock,
        fold=fold)
    nq8 = mvp.shape[1]
    rows = []
    for nib in range(8):
        rows.append(((mvp >> (4 * nib)) & 0xF).astype(jnp.uint8))
    moves = jnp.stack(rows, axis=2).reshape(P, nq8 * 8, mvp.shape[2])
    return score, jend, moves[:, :nq, :]


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap_open", "gap_ext", "interpret",
    "p_tile", "nh", "superblock"))
def banded_align_trace_pallas(queries, targets, q_lens, t_lens,
                              band: int = 128, match: int = 5,
                              mismatch: int = -4, gap_open: int = 4,
                              gap_ext: int = 2, interpret: bool = False,
                              p_tile: int = P_TILE, nh: int = 1,
                              superblock: bool = False):
    """Pallas forward + the reverse-walk scan on packed move words.

    Same contract as kernels.banded.banded_align_trace_batch:
    returns (scores, j_end, j_start, i_rem, ops, edge)."""
    from .banded import walk_ops_packed

    scores, j_end, mvp = banded_fwd_pallas_packed(
        queries, targets, q_lens, t_lens, band=band, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        interpret=interpret, p_tile=p_tile, nh=nh, superblock=superblock)
    j_f, i_f, ops, edge = walk_ops_packed(mvp, q_lens, t_lens, j_end, band)
    return scores, j_end, j_f, i_f, ops, edge


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap_open", "gap_ext", "interpret",
    "p_tile", "shrink", "nh", "wide_walk", "superblock", "fold",
    "vmem_mb", "early"))
def banded_align_trace_pallas_cached(queries, targets, q_lens, t_lens,
                                     band: int = 128, match: int = 5,
                                     mismatch: int = -4, gap_open: int = 4,
                                     gap_ext: int = 2,
                                     interpret: bool = False,
                                     p_tile: int = P_TILE,
                                     shrink: int = 5, nh: int = 1,
                                     wide_walk: bool = False,
                                     superblock: bool = False,
                                     fold: bool = False,
                                     vmem_mb: int = 0,
                                     early: bool = False):
    """Pallas forward + the word-cached walk (kernels.banded
    walk_ops_cached).  Returns (scores, j_end, j_start, i_rem,
    packed_ops, edge) — ops are 2-bit packed with gaps; consume with
    native.ops_record(s)(_batch)(packed=True) or unpack_ops_packed."""
    from .banded import walk_ops_cached

    scores, j_end, mvp = banded_fwd_pallas_packed(
        queries, targets, q_lens, t_lens, band=band, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        interpret=interpret, p_tile=p_tile, nh=nh, superblock=superblock,
        fold=fold, vmem_mb=vmem_mb, early=early)
    # wide halves the serial gather chain per substep, but hits/gather
    # cap below 2x (column drift + word-row crossings over 16 substeps):
    # shrink+2 keeps every pair completing at nanopore error rates
    # (12% arms in tests) while still cutting iterations ~1.4x.
    j_f, i_f, ops, edge = walk_ops_cached(
        mvp, q_lens, t_lens, j_end, band,
        shrink=shrink + 2 if wide_walk else shrink, wide=wide_walk)
    return scores, j_end, j_f, i_f, ops, edge
