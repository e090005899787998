"""Transposed Pallas forward for the banded aligner: band on SUBLANES.

Bit-identical DP to kernels/banded.py (same moves, scores, j_end) in a
layout chosen from measured per-primitive costs (tools/
mosaic_floor_probe.py, v5e): a dependent LANE-crossing roll/shift costs
~74 ns while a SUBLANE roll costs ~3 ns and elementwise ops ~2 ns.  The
row recurrence's serial chain is almost entirely shifts (band advance,
Hd/Hp alignment, the 7-level F prefix-max, F/fext rolls): in the classic
(P, W) layout those are all lane shifts — ~11 x 74 ns = the measured
~0.9 us/row fixed cost that six round-3 restructurings could not move.

Here state is (W, P_LANES): the band offset k lives on sublanes, pairs
on lanes.  Every shift in the chain becomes a sublane roll; the expected
row chain is ~10-20x cheaper, and each op covers 16 native tiles
(P_LANES=128), keeping the issue cost diluted.

Two inputs change shape (built by the wrapper, device-side):
- q_t: (nq, P) int8 — the query char of row i is one dynamic-sublane
  row read, eliminating the carried query window and its rolls;
- stages: (NRF, STAGE_T, P) int8 — the target-window refill planes,
  precomputed with ONE batched gather (the in-kernel per-pair refill
  rolls were the old block body's most expensive group and are
  impossible on the lane axis).  Refill r (row 32r + 1) holds
  t[lo(32r+1) - 1 + W + off] for off < STAGE_T, pad 4 outside [0, nt).

The walk consumes the transposed move words via walk_ops_cached_t.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import SMAX, band_lo_fn

NEG = -(2 ** 28)

P_LANES = 128        # pairs per grid step (the lane dimension)
STAGE_T = 136        # staged lookahead chars (8-aligned for sublane tiling)
REFILL_ROWS = 32     # rows between stage refills; SMAX * 32 = 96 < STAGE_T


def _kernel_t(ql_ref, tl_ref, qt_ref, stg_ref, mvp_ref, score_ref,
              jend_ref, H_s, E_s, buf_s, lo_s, *, match, mismatch,
              gap_open, gap_ext, W, nq, nt, levels, RC8, NC, NRF,
              NHEAD, EARLY, STRIP=()):
    # STRIP: perf-bisect switches (break bit-parity; tools use only):
    # "selshift" (pretend s=0), "prefix" (skip F closure), "store"
    # (write only block 0's plane), "qload" (constant q), "refill"
    # (never restock)
    oe = gap_open + gap_ext
    e = gap_ext
    PL = ql_ref.shape[1]
    ql = ql_ref[:].astype(jnp.int32)          # (1, PL)
    tl = tl_ref[:].astype(jnp.int32)
    karr = jax.lax.broadcasted_iota(jnp.int32, (W, PL), 0)
    ci = pl.program_id(1)                     # row-chunk index (sequential)
    hi = jnp.maximum(tl + 1 - W, 0)

    def lo_of(i):
        i_eff = jnp.minimum(i, ql).astype(jnp.float32)
        ctr = jnp.round(i_eff * tl.astype(jnp.float32) /
                        jnp.maximum(ql, 1).astype(jnp.float32))
        return jnp.clip(ctr.astype(jnp.int32) - W // 2, 0, hi)

    @pl.when(ci == 0)
    def _init():
        lo0 = lo_of(jnp.int32(0))
        in_band0 = (lo0 + karr) <= tl
        H_s[:] = jnp.where(in_band0, 0, NEG)
        E_s[:] = jnp.full((W, PL), NEG, dtype=jnp.int32)
        # initial anchor a = lo(0) - 1 = -1: buf = [pad | t[0 : W+ST-2]].
        # The head window t[0 : W+STAGE_T-1] ships as NHEAD extra stage
        # planes appended after the NRF refill planes
        head = jnp.concatenate(
            [stg_ref[NRF + h].astype(jnp.int32) for h in range(NHEAD)],
            axis=0)
        pad = jnp.full((1, PL), 4, dtype=jnp.int32)
        buf_s[:] = jnp.concatenate(
            [pad, head[:W + STAGE_T - 1]], axis=0)
        lo_s[:] = lo0

    def sel_shift_sub(M, s, delta, fill):
        """M[k + s + delta] for per-pair s in [0, SMAX] along sublanes."""
        n = M.shape[0]
        kk = jax.lax.broadcasted_iota(jnp.int32, (n, PL), 0)
        out = None
        for v in range(SMAX + 1):
            d = v + delta
            if d >= 0:
                sh = pltpu.roll(M, shift=(n - d) % n, axis=0)
                sh = jnp.where(kk < n - d, sh, fill)
            else:
                sh = pltpu.roll(M, shift=-d, axis=0)
                sh = jnp.where(kk >= -d, sh, fill)
            out = sh if out is None else jnp.where(s == v, sh, out)
        return out

    def refill(buf, lo_i, rfi):
        stage = stg_ref[rfi].astype(jnp.int32)           # (STAGE_T, PL)
        off = jax.lax.broadcasted_iota(jnp.int32, (STAGE_T, PL), 0)
        pos = (lo_i - 1 + W) + off
        stage = jnp.where((pos < 0) | (pos >= tl), 4, stage)
        return jnp.concatenate([buf[:W], stage], axis=0)

    def row_step(i, b, qc, st, first_row):
        H, E, buf, lo_prev = st
        lo_i = lo_of(i)
        s = lo_i - lo_prev                                   # (1, PL)
        if "selshift" in STRIP:
            Hp, Ep, Hd = H, E, pltpu.roll(H, shift=1, axis=0)
        else:
            Hp = sel_shift_sub(H, s, 0, NEG)
            Ep = sel_shift_sub(E, s, 0, NEG)
            Hd = sel_shift_sub(H, s, -1, NEG)
            buf = sel_shift_sub(buf, s, 0, 4)
        if first_row and "refill" not in STRIP:
            # refill cadence: every REFILL_ROWS // 8 blocks (traced b)
            rfi = b // (REFILL_ROWS // 8)
            buf = jax.lax.cond(b % (REFILL_ROWS // 8) == 0,
                               lambda: refill(buf, lo_i, rfi),
                               lambda: buf)
        tc = buf[:W]
        sub = jnp.where((qc == 4) | (tc == 4), 0,
                        jnp.where(qc == tc, match, mismatch))

        jcol = lo_i + karr
        En = jnp.maximum(Hp - oe, Ep - e)
        eext = (Ep - e) > (Hp - oe)
        diag = jnp.where(jcol >= 1, Hd + sub, NEG)
        Ht = jnp.maximum(diag, En)
        A = Ht + e * karr
        if "prefix" in STRIP:
            pass
        elif EARLY:
            def _cond(stt):
                d_, _A, changed = stt
                return jnp.logical_and(d_ < W, changed)

            def _body(stt):
                d_, A_, _ = stt
                sh = pltpu.roll(A_, shift=d_, axis=0)
                sh = jnp.where(karr >= d_, sh, NEG)
                A2 = jnp.maximum(A_, sh)
                return d_ * 2, A2, jnp.any(A2 != A_)

            _, A, _ = jax.lax.while_loop(
                _cond, _body, (jnp.int32(1), A, jnp.bool_(True)))
        else:
            d = 1
            for _ in range(levels):
                sh = pltpu.roll(A, shift=d, axis=0)
                sh = jnp.where(karr >= d, sh, NEG)
                A = jnp.maximum(A, sh)
                d *= 2
        F = jnp.where(karr >= 1,
                      pltpu.roll(A, shift=1, axis=0) - oe - e * karr + e,
                      NEG)
        fprev = jnp.where(karr >= 1, pltpu.roll(F, shift=1, axis=0), NEG)
        htprev = jnp.where(karr >= 1, pltpu.roll(Ht, shift=1, axis=0),
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

    def block(b, carry):
        # one 8-row block = one finished (W, PL) move-word plane,
        # stored tile-aligned at out plane b - ci * RC8 (no flush
        # groups: the word plane IS a whole tile stack on this layout)
        i0 = 8 * b + 1
        st = carry
        pack = None
        # one 8-aligned (8, PL) load covers the block's query chars
        # (Mosaic requires dynamic sublane offsets provably % 8 == 0;
        # rows i0-1 .. i0+6 = 8b .. 8b+7 are exactly one aligned block)
        if "qload" in STRIP:
            qblk = jnp.zeros((8, PL), dtype=jnp.int32)
        else:
            qblk = qt_ref[pl.ds(pl.multiple_of(8 * b, 8), 8)]
        for u in range(8):
            i = i0 + u
            qc = qblk[u:u + 1]                               # (1, PL)
            st, mv = row_step(i, b, qc, st, first_row=(u == 0))
            pack = mv if u == 0 else pack | (mv << (4 * u))
        if "store" in STRIP:
            mvp_ref[0, 0] = pack
        else:
            mvp_ref[0, b - ci * RC8] = pack
        return st

    nb = jnp.minimum((jnp.max(ql) + 7) // 8, nq // 8)
    b_st = ci * RC8
    b_en = jnp.clip(nb, b_st, b_st + RC8)
    carry0 = (H_s[:], E_s[:], buf_s[:], lo_s[:])
    Hf, Ef, buff, lof = jax.lax.fori_loop(b_st, b_en, block, carry0)
    H_s[:], E_s[:], buf_s[:], lo_s[:] = Hf, Ef, buff, lof

    @pl.when(ci == NC - 1)
    def _final():
        mx = jnp.max(Hf, axis=0, keepdims=True)
        score_ref[:] = mx
        k_end = jnp.min(jnp.where(Hf == mx, karr, W), axis=0,
                        keepdims=True)
        jend_ref[:] = lof + k_end


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap_open", "gap_ext", "interpret",
    "early", "vmem_mb", "strip"))
def banded_fwd_pallas_t(queries, targets, q_lens, t_lens,
                        band: int = 128, match: int = 5,
                        mismatch: int = -4, gap_open: int = 4,
                        gap_ext: int = 2, interpret: bool = False,
                        early: bool = False, vmem_mb: int = 128,
                        strip: tuple = ()):
    """Transposed forward: returns (scores (P,), j_end (P,),
    packed moves (P_pad//PL, nq_pad/8, W, PL) int32 — see
    walk_ops_cached_t for the layout contract).

    queries/targets: (P, nq)/(P, nt) int8 pad 4, same contract as
    banded_fwd_pallas_packed (requires nt <= SMAX * nq per pair).
    """
    P, nq = queries.shape
    _, nt = targets.shape
    W = band
    P_orig = P
    if P % P_LANES:
        padP = P_LANES - P % P_LANES
        queries = jnp.pad(queries, ((0, padP), (0, 0)), constant_values=4)
        targets = jnp.pad(targets, ((0, padP), (0, 0)), constant_values=4)
        q_lens = jnp.pad(jnp.asarray(q_lens), (0, padP), constant_values=1)
        t_lens = jnp.pad(jnp.asarray(t_lens), (0, padP), constant_values=1)
        P += padP
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
    min_nt = W + STAGE_T + 8
    if nt < min_nt:
        targets = jnp.pad(targets, ((0, 0), (0, min_nt - nt)),
                          constant_values=4)
        nt = min_nt

    levels = 1
    while (1 << levels) < W:
        levels += 1

    RC8 = RCHUNK // 8
    NC = nq // RCHUNK
    ql = q_lens.astype(jnp.int32).reshape(P)
    tl = t_lens.astype(jnp.int32).reshape(P)
    nP = P // P_LANES
    nq8 = nq // 8

    # ---- device-side suppliers (one batched op each) ----
    # transposed queries: row i holds q[i] for every pair.  int32 so the
    # kernel's 8-row dynamic-sublane loads sit on (8, 128) tiles
    qt = queries.T.astype(jnp.int32)                 # (nq, P)

    # stage refill planes: NRF per-32-rows refills + ONE head plane
    # (the init window t[0 : W + STAGE_T - 1]) appended as plane NRF
    lo_fn = band_lo_fn(ql, tl, W)
    NRF = nq // REFILL_ROWS
    i_r = (1 + REFILL_ROWS *
           jnp.arange(NRF, dtype=jnp.int32))[:, None]         # (NRF, 1)
    lo_r = lo_fn(i_r)                                         # (NRF, P)
    off = jnp.arange(STAGE_T, dtype=jnp.int32)
    pos = lo_r[:, :, None] - 1 + W + off[None, None, :]       # (NRF,P,ST)
    posc = jnp.clip(pos, 0, nt - 1)
    g = jnp.take_along_axis(targets[None, :, :],
                            posc.transpose(1, 0, 2).reshape(1, P, -1),
                            axis=2)
    g = g.reshape(P, NRF, STAGE_T).transpose(1, 2, 0)         # (NRF,ST,P)
    # int32 planes: the (STAGE_T, PL) slices then sit on (8, 128) tiles
    # (int8 would need 32-sublane tiling, which 136 rows are not)
    stages = jnp.where(
        (pos < 0).transpose(0, 2, 1) | (pos >= nt).transpose(0, 2, 1),
        4, g.astype(jnp.int32))
    # the init head window t[0 : W+STAGE_T-1] ships as extra planes
    HEAD_ROWS = W + STAGE_T - 1
    n_head = -(-HEAD_ROWS // STAGE_T)
    head_flat = jnp.pad(targets[:, :HEAD_ROWS].T,
                        ((0, n_head * STAGE_T - HEAD_ROWS), (0, 0)),
                        constant_values=4).astype(jnp.int32)
    head_planes = head_flat.reshape(n_head, STAGE_T, P)
    stages = jnp.concatenate([stages, head_planes], axis=0)

    cparams = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)
               if vmem_mb else None)
    NRF_TOT = stages.shape[0]

    kernel = functools.partial(
        _kernel_t, match=match, mismatch=mismatch, gap_open=gap_open,
        gap_ext=gap_ext, W=W, nq=nq, nt=nt, levels=levels, RC8=RC8,
        NC=NC, NRF=NRF, NHEAD=n_head, EARLY=early, STRIP=strip)
    scratch = [
        pltpu.VMEM((W, P_LANES), jnp.int32),             # H
        pltpu.VMEM((W, P_LANES), jnp.int32),             # E
        pltpu.VMEM((W + STAGE_T, P_LANES), jnp.int32),   # target window
        pltpu.VMEM((1, P_LANES), jnp.int32),             # lo_prev
    ]
    mvp, score, jend = pl.pallas_call(
        kernel,
        grid=(nP, NC),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec((1, P_LANES), lambda p, c: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_LANES), lambda p, c: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, P_LANES), lambda p, c: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NRF_TOT, STAGE_T, P_LANES),
                         lambda p, c: (0, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RC8, W, P_LANES), lambda p, c: (p, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_LANES), lambda p, c: (0, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P_LANES), lambda p, c: (0, p),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nP, nq8, W, P_LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, P), jnp.int32),
            jax.ShapeDtypeStruct((1, P), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(ql.reshape(1, P), tl.reshape(1, P), qt, stages)
    return score[0, :P_orig], jend[0, :P_orig], mvp


OP_NONE, OP_DIAG, OP_INS, OP_DEL = 0, 1, 2, 3


@functools.partial(jax.jit, static_argnames=("band", "shrink"))
def walk_ops_cached_t(mvp: jax.Array, q_lens: jax.Array,
                      t_lens: jax.Array, j_end: jax.Array, band: int,
                      shrink: int = 5):
    """Word-cached reverse walk over TRANSPOSED move words.

    mvp: (nP, nq8, W, PL) int32 from banded_fwd_pallas_t — pair p lives
    at (p // PL, :, :, p % PL); row i's move byte is nibble (i-1) % 8 of
    word plane (i-1)//8 at sublane k.  Identical walk semantics and
    output contract to kernels.banded.walk_ops_cached (2-bit packed
    gapped ops; i_rem > 0 = budget exhausted -> host realign)."""
    nP, nq8, W, PL = mvp.shape
    P = nP * PL
    nq_max = nq8 * 8
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    # pair-major flat view: axis 0 = word-plane*W + k, axis 1 = pair
    mvp_flat = mvp.transpose(1, 2, 0, 3).reshape(nq8 * W, P)
    if P != q_lens.shape[0]:
        pad = P - q_lens.shape[0]
        q_lens = jnp.pad(q_lens, (0, pad), constant_values=1)
        t_lens = jnp.pad(t_lens, (0, pad), constant_values=1)
        j_end = jnp.pad(j_end.astype(jnp.int32), (0, pad))
    lo_of = band_lo_fn(q_lens, t_lens, W)

    def substep(carry, w3, m_c, k_c):
        i, j, st, edge = carry
        active = i > 0
        im1 = jnp.clip(i - 1, 0, nq_max - 1)
        k_raw = j - lo_of(i)
        k = jnp.clip(k_raw, 0, W - 1)
        d = k - k_c
        m = im1 // 8
        hit = active & (m == m_c) & (jnp.abs(d) <= 1)
        word = jnp.where(d == -1, w3[0],
                         jnp.where(d == 0, w3[1], w3[2]))
        mv = (word >> (4 * (im1 % 8))) & 0xF
        src = mv & 3
        is_e = (st == 1) | ((st == 0) & (src == 1))
        is_f = (st == 2) | ((st == 0) & (src == 2))
        is_d = (st == 0) & (src == 0)
        op = jnp.where(
            hit,
            jnp.where(is_d, OP_DIAG, jnp.where(is_e, OP_INS, OP_DEL)),
            OP_NONE).astype(jnp.int32)
        dec_i = hit & (is_d | is_e)
        dec_j = hit & (is_d | is_f)
        st_next = jnp.where(
            is_e & ((mv & 4) != 0), 1,
            jnp.where(is_f & ((mv & 8) != 0), 2, 0)).astype(jnp.int32)
        st_next = jnp.where(hit, st_next, st)
        lo_i = j - k_raw
        edge = edge | (hit & (((k_raw == 0) & (lo_i > 0)) |
                              ((k_raw == W - 1) & (lo_i + W <= t_lens))))
        return (i - dec_i.astype(jnp.int32),
                j - dec_j.astype(jnp.int32), st_next, edge), op

    def iteration(carry, _):
        i, j, _st, _edge = carry
        im1 = jnp.clip(i - 1, 0, nq_max - 1)
        m_c = im1 // 8
        k_c = jnp.clip(j - lo_of(i), 0, W - 1)
        cols = jnp.stack([jnp.maximum(k_c - 1, 0), k_c,
                          jnp.minimum(k_c + 1, W - 1)], axis=0)  # (3, P)
        idx = m_c[None, :] * W + cols
        w3 = jnp.take_along_axis(mvp_flat, idx, axis=0)          # (3, P)
        acc = jnp.zeros(i.shape, dtype=jnp.int32)
        for s in range(8):
            carry, op = substep(carry, w3, m_c, k_c)
            acc = acc | (op << (2 * s))
        return carry, acc

    n_iters = -(-(nq_max + band + 64) // shrink)
    init = (q_lens, j_end.astype(jnp.int32),
            jnp.zeros(P, dtype=jnp.int32), jnp.zeros(P, dtype=bool))
    (i_f, j_f, _st, edge), opsw = jax.lax.scan(iteration, init, None,
                                               length=n_iters)
    opsw = jnp.transpose(opsw, (1, 0))
    bytes_ = [(opsw >> (8 * b)) & 0xFF for b in range(2)]
    ops = jnp.stack(bytes_, axis=2).reshape(
        P, n_iters * 2).astype(jnp.uint8)
    return j_f, i_f, ops, edge


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap_open", "gap_ext", "interpret",
    "shrink", "early", "vmem_mb"))
def banded_align_trace_pallas_t(queries, targets, q_lens, t_lens,
                                band: int = 128, match: int = 5,
                                mismatch: int = -4, gap_open: int = 4,
                                gap_ext: int = 2,
                                interpret: bool = False,
                                shrink: int = 5,
                                early: bool = False,
                                vmem_mb: int = 128):
    """Transposed forward + word-cached walk.  Same contract as
    banded_align_trace_pallas_cached: (scores, j_end, j_start, i_rem,
    packed_ops, edge)."""
    P = queries.shape[0]
    scores, j_end, mvp = banded_fwd_pallas_t(
        queries, targets, q_lens, t_lens, band=band, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext,
        interpret=interpret, early=early, vmem_mb=vmem_mb)
    j_f, i_f, ops, edge = walk_ops_cached_t(
        mvp, q_lens, t_lens, j_end, band, shrink=shrink)
    return scores, j_end, j_f[:P], i_f[:P], ops[:P], edge[:P]
