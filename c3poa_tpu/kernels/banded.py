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


# max band shift per DP row; requires nt <= SMAX * nq per pair (the backend
# guarantees this by windowing length-mismatched pairs)
SMAX = 3


def band_lo_fn(q_lens, t_lens, band):
    """The band placement lo(i) as a traced closure — THE single
    definition every forward kernel and walker shares (the host twins
    are band_starts_np and native/traceback.c:band_lo).  Any change here
    must land in those two as well or forward moves desynchronize from
    the walks."""
    hi = jnp.maximum(t_lens + 1 - band, 0)

    def lo_of(i):
        i_eff = jnp.minimum(i, q_lens).astype(jnp.float32)
        ctr = jnp.round(i_eff * t_lens.astype(jnp.float32) /
                        jnp.maximum(q_lens, 1).astype(jnp.float32))
        return jnp.clip(ctr.astype(jnp.int32) - band // 2, 0, hi)

    return lo_of


@partial(jax.jit, static_argnames=("band", "match", "mismatch",
                                   "gap_open", "gap_ext"))
def banded_align_batch(queries: jax.Array, targets: jax.Array,
                       q_lens: jax.Array, t_lens: jax.Array,
                       band: int = 128, match: int = 5, mismatch: int = -4,
                       gap_open: int = 4, gap_ext: int = 2):
    """queries: (P, nq_max) int8 pad 4; targets: (P, nt_max) int8 pad 4.

    Returns (scores (P,) int32, j_end (P,) int32,
             moves (P, nq_max, W) uint8) — moves row r holds DP row r+1.

    Gather-free formulation (dynamic per-row gathers cost ~500us/step on
    TPU): the band start advances by s = lo(i) - lo(i-1) in {0..SMAX} per
    row, so prev-row realignment is a select over SMAX+1 *static* shifts,
    and target chars come from a carried sliding window refreshed with one
    (P, SMAX+1) gather per step.  Requires nt <= SMAX * nq.
    """
    P, nq_max = queries.shape
    _, nt_max = targets.shape
    if nq_max % 4:  # pad rows to the scan unroll factor (frozen no-ops)
        queries = jnp.pad(queries, ((0, 0), (0, 4 - nq_max % 4)),
                          constant_values=4)
        nq_max = queries.shape[1]
    W = band
    oe = jnp.int32(gap_open + gap_ext)
    e = jnp.int32(gap_ext)
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    queries = queries.astype(jnp.int32)
    targets = targets.astype(jnp.int32)

    karr = jnp.arange(W, dtype=jnp.int32)[None, :]           # (1, W)
    R = SMAX + 1
    lo_of = band_lo_fn(q_lens, t_lens, W)                    # (P,) per row

    def sel_shift(M, s, delta, fill):
        """M[p, k + s[p] + delta] via select over static shifts;
        s in [0, SMAX], delta in {-1, 0}."""
        out = None
        for v in range(R):
            d = v + delta
            if d >= 0:
                sh = jnp.pad(M[:, d:], ((0, 0), (0, d)), constant_values=fill)
            else:
                sh = jnp.pad(M[:, :d], ((0, 0), (-d, 0)), constant_values=fill)
            out = sh if out is None else \
                jnp.where((s == v)[:, None], sh, out)
        return out

    def cummax(A):
        # manual doubling: static shifts only
        d = 1
        while d < W:
            A = jnp.maximum(
                A, jnp.pad(A[:, :-d], ((0, 0), (d, 0)), constant_values=NEG))
            d *= 2
        return A

    lo0 = lo_of(jnp.int32(0))                                # == 0 always
    in_band0 = (lo0[:, None] + karr) <= t_lens[:, None]
    H0 = jnp.where(in_band0, 0, NEG)
    E0 = jnp.full((P, W), NEG, dtype=jnp.int32)
    # target char window: tw[k] = t[lo(i) - 1 + k], width W + SMAX + 1.
    # lo(0) = 0, so the initial anchor is -1: [pad, t[0], ..., t[W+SMAX-1]]
    tw0 = jnp.concatenate(
        [jnp.full((P, 1), 4, dtype=jnp.int32), targets[:, :W + SMAX]], axis=1)

    refill_off = jnp.arange(R, dtype=jnp.int32)[None, :]     # (1, R)

    def step(carry, i):
        H_prev, E_prev, tw, lo_prev = carry
        lo_i = lo_of(i)
        s = lo_i - lo_prev                                   # (P,) in [0,SMAX]
        Hp = sel_shift(H_prev, s, 0, NEG)
        Ep = sel_shift(E_prev, s, 0, NEG)
        Hd = sel_shift(H_prev, s, -1, NEG)
        tw = sel_shift(tw, s, 0, 4)
        # refresh the (possibly stale) top R window slots with one tiny gather
        ridx = lo_i[:, None] - 1 + W + refill_off            # (P, R)
        rch = jnp.take_along_axis(
            targets, jnp.clip(ridx, 0, nt_max - 1), axis=1)
        rch = jnp.where((ridx < 0) | (ridx >= nt_max), 4, rch)
        tw = jnp.concatenate([tw[:, :W], rch], axis=1)

        jcol = lo_i[:, None] + karr                          # (P, W)
        qi = jnp.clip(i - 1, 0, nq_max - 1)
        qc = jax.lax.dynamic_slice_in_dim(queries, qi, 1, axis=1)  # (P, 1)
        tc = tw[:, :W]                                       # t[jcol - 1]
        sub = jnp.where((qc == 4) | (tc == 4), 0,
                        jnp.where(qc == tc, match, mismatch))

        E = jnp.maximum(Hp - oe, Ep - e)
        eext = (Ep - e) > (Hp - oe)
        diag = jnp.where(jcol >= 1, Hd + sub, NEG)
        Ht = jnp.maximum(diag, E)
        # F[k] = max_{u<k}(Ht[u] - oe - e*(k-1-u)) via prefix max
        A = Ht + e * karr
        cm = cummax(A)
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
        return (H, E, tw, lo_i), mv

    # unroll rows per scan step: the per-step state round-trip (HBM) and
    # loop overhead dominate the tiny (P, W) row work.  Measured on the
    # v5e at (512 reads, P<=2048): UNROLL 4 -> 16 cut the align stage
    # 4.8 -> 3.3 s (end-to-end 52.8 -> 75.5 reads/s).  CPU keeps 4: the
    # 16x body makes CPU XLA compiles (tests) several times slower.
    default_unroll = "16" if jax.default_backend() != "cpu" else "4"
    UNROLL = int(__import__("os").environ.get("C3POA_FWD_UNROLL",
                                              default_unroll))
    if nq_max % UNROLL:
        queries = jnp.pad(queries, ((0, 0), (0, UNROLL - nq_max % UNROLL)),
                          constant_values=4)
        nq_max = queries.shape[1]

    def step_u(carry, i0):
        mvs = []
        for k in range(UNROLL):
            carry, mv = step(carry, i0 + k)
            mvs.append(mv)
        return carry, jnp.stack(mvs, axis=1)                 # (P, U, W)

    starts = jnp.arange(1, nq_max + 1, UNROLL, dtype=jnp.int32)
    (Hf, _Ef, _tw, lof), moves = jax.lax.scan(
        step_u, (H0, E0, tw0, lo0), starts)
    # (steps, P, U, W) -> (P, nq_max, W)
    moves = jnp.transpose(moves, (1, 0, 2, 3)).reshape(P, nq_max, W)

    score = jnp.max(Hf, axis=1)
    k_end = jnp.argmax(Hf, axis=1).astype(jnp.int32)
    j_end = lof + k_end
    return score, j_end, moves


OP_NONE, OP_DIAG, OP_INS, OP_DEL = 0, 1, 2, 3


@partial(jax.jit, static_argnames=("band",))
def walk_ops_packed(mvp: jax.Array, q_lens: jax.Array, t_lens: jax.Array,
                    j_end: jax.Array, band: int):
    """Reverse path walk over nibble-packed move words.

    mvp: (P, nq_pad/8, W) int32 from the Pallas forward — row i's move
    byte is nibble (i-1) % 8 of word (i-1)//8.  Same walk as
    banded_align_trace_batch; returns (j_start, i_rem, ops, edge) —
    ``edge`` flags pairs whose path visited band-local column 0 or
    W-1 (the fast-band escalation signal, see ConsensusParams
    .fast_band)."""
    P, nq8, W = mvp.shape
    nq_max = nq8 * 8
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    mvp_flat = mvp.reshape(P, nq8 * W)
    parr = jnp.arange(P, dtype=jnp.int32)
    lo_of = band_lo_fn(q_lens, t_lens, W)

    def walk(carry, _):
        i, j, st, edge = carry
        active = i > 0
        lo_i = lo_of(i)
        k = j - lo_i
        # INTERIOR band edges only: the left edge counts only when
        # columns are excluded before it (lo > 0), the right edge only
        # when columns exist beyond it (lo + W <= nt) — paths naturally
        # start at j=0 and end at j=nt without being band-limited
        edge = edge | (active & (((k == 0) & (lo_i > 0)) |
                                 ((k == W - 1) & (lo_i + W <= t_lens))))
        im1 = jnp.clip(i - 1, 0, nq_max - 1)
        flat = (im1 // 8) * W + jnp.clip(k, 0, W - 1)
        word = mvp_flat[parr, flat]
        mv = (word >> (4 * (im1 % 8))) & 0xF
        src = mv & 3
        is_e = (st == 1) | ((st == 0) & (src == 1))
        is_f = (st == 2) | ((st == 0) & (src == 2))
        is_d = (st == 0) & (src == 0)
        op = jnp.where(
            active,
            jnp.where(is_d, OP_DIAG,
                      jnp.where(is_e, OP_INS, OP_DEL)),
            OP_NONE).astype(jnp.uint8)
        dec_i = active & (is_d | is_e)
        dec_j = active & (is_d | is_f)
        e_ext = (mv & 4) != 0
        f_ext = (mv & 8) != 0
        st_next = jnp.where(
            is_e & e_ext, 1,
            jnp.where(is_f & f_ext, 2, 0)).astype(jnp.int32)
        st_next = jnp.where(active, st_next, st)
        return (i - dec_i.astype(jnp.int32),
                j - dec_j.astype(jnp.int32), st_next, edge), op

    UNROLL = 4
    n_steps = -(-(nq_max + W + 64) // UNROLL)

    def walk_u(carry, _):
        opss = []
        for _k in range(UNROLL):
            carry, op = walk(carry, None)
            opss.append(op)
        return carry, jnp.stack(opss, axis=1)

    init = (q_lens, j_end.astype(jnp.int32), jnp.zeros(P, dtype=jnp.int32),
            jnp.zeros(P, dtype=bool))
    (i_f, j_f, _st, edge), ops = jax.lax.scan(walk_u, init, None,
                                              length=n_steps)
    ops = jnp.transpose(ops, (1, 0, 2)).reshape(P, n_steps * UNROLL)
    return j_f, i_f, ops, edge


@partial(jax.jit, static_argnames=("band", "shrink", "wide"))
def walk_ops_cached(mvp: jax.Array, q_lens: jax.Array, t_lens: jax.Array,
                    j_end: jax.Array, band: int, shrink: int = 5,
                    wide: bool = False):
    """Word-cached reverse walk over nibble-packed move words.

    The plain walk (walk_ops_packed) is latency-bound: one dependent
    (P,) gather per path step.  Each packed word already holds 8 rows of
    moves at one band column, and a real path stays on one (word, column
    +-1) patch for ~6 steps at nanopore error rates (the band slope is
    ~1 for the pipeline's length-filtered subread/draft pairs), so one
    (P, 3)-contiguous-word gather feeds up to 8 substeps: ~4x fewer
    serial gathers.

    Ops come out 2-bit packed, four per byte (1=diag 2=ins 3=del), with
    0 gaps where a substep missed the cache; consumers skip gaps and
    stop when the query is consumed (native c3_ops_record_packed /
    unpack_ops_packed).  The iteration budget is (nq + W + 64) / shrink
    gathers; pairs that exhaust it finish with ``i_rem > 0`` and the
    caller realigns them on the host, exactly like pathological paths
    under the plain walk.  Returns (j_start, i_rem, packed_ops
    (P, n_iters*2) uint8, edge) — ``edge`` flags pairs whose path
    visited band-local column 0 or W-1 (identical accumulation to the
    plain walk: only applied/hit substeps count, and every visited cell
    is eventually a hit).

    ``wide``: also cache word-row m_c - 1 (a (P, 6) gather — columns
    k_c +- 1 of both word rows) and run 16 substeps per gather: i only
    decreases, so a path leaving word m_c enters m_c - 1 and keeps
    hitting.  Halves the serial gather chain, but hits/gather cap
    below 2x — over 16 substeps, paths drift past the +-1 column
    window and can cross into word m_c - 2 — so pair with a ~1.4x
    shrink (callers use shrink+2), which still completes every pair
    at 12%-error nanopore rates.  Output bytes per iteration double
    (same flat 2-bit stream to consumers)."""
    P, nq8, W = mvp.shape
    nq_max = nq8 * 8
    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    mvp_flat = mvp.reshape(P, nq8 * W)
    lo_of = band_lo_fn(q_lens, t_lens, W)
    nsub = 16 if wide else 8

    def substep(carry, w3, m_c, k_c):
        i, j, st, edge = carry
        active = i > 0
        im1 = jnp.clip(i - 1, 0, nq_max - 1)
        k_raw = j - lo_of(i)
        k = jnp.clip(k_raw, 0, W - 1)
        d = k - k_c
        m = im1 // 8
        if wide:
            hit = active & ((m == m_c) | (m == m_c - 1)) & (jnp.abs(d) <= 1)
            w_r0 = jnp.where(d == -1, w3[:, 0],
                             jnp.where(d == 0, w3[:, 1], w3[:, 2]))
            w_r1 = jnp.where(d == -1, w3[:, 3],
                             jnp.where(d == 0, w3[:, 4], w3[:, 5]))
            word = jnp.where(m == m_c, w_r0, w_r1)
        else:
            hit = active & (m == m_c) & (jnp.abs(d) <= 1)
            word = jnp.where(d == -1, w3[:, 0],
                             jnp.where(d == 0, w3[:, 1], w3[:, 2]))
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
                          jnp.minimum(k_c + 1, W - 1)], axis=1)   # (P, 3)
        idx = m_c[:, None] * W + cols
        if wide:
            idx = jnp.concatenate(
                [idx, jnp.maximum(m_c - 1, 0)[:, None] * W + cols], axis=1)
        w3 = jnp.take_along_axis(mvp_flat, idx, axis=1)
        # One int32 accumulator for ALL substeps (2 bits each, <= 32
        # bits): XLA:CPU compile time explodes superlinearly in the
        # NUMBER of stacked per-iteration scan outputs (4 uint8 words
        # hang the compiler; the same ops in wider words are fine), so
        # emit a single word and byte-slice after the scan.
        acc = jnp.zeros(i.shape, dtype=jnp.int32)
        for s in range(nsub):
            carry, op = substep(carry, w3, m_c, k_c)
            acc = acc | (op << (2 * s))
        return carry, acc

    n_iters = -(-(nq_max + band + 64) // shrink)
    init = (q_lens, j_end.astype(jnp.int32), jnp.zeros(P, dtype=jnp.int32),
            jnp.zeros(P, dtype=bool))
    (i_f, j_f, _st, edge), opsw = jax.lax.scan(iteration, init, None,
                                               length=n_iters)
    # (n_iters, P) int32 -> (P, n_iters * nsub//4) uint8, byte b of each
    # word holding ops 4b..4b+3 — the same flat little-endian 2-bit
    # stream the consumers always read.
    opsw = jnp.transpose(opsw, (1, 0))
    bytes_ = [(opsw >> (8 * b)) & 0xFF for b in range(nsub // 4)]
    ops = jnp.stack(bytes_, axis=2).reshape(
        P, n_iters * (nsub // 4)).astype(jnp.uint8)
    return j_f, i_f, ops, edge


def unpack_ops_packed(row: np.ndarray) -> np.ndarray:
    """Host helper: 2-bit packed gapped ops -> dense uint8 op stream
    (gaps removed), for the Python fallback and tests."""
    row = np.asarray(row, dtype=np.uint8)
    all_ops = np.zeros(4 * len(row), dtype=np.uint8)
    for s in range(4):
        all_ops[s::4] = (row >> (2 * s)) & 3
    return all_ops[all_ops != 0]


@partial(jax.jit, static_argnames=("band", "match", "mismatch",
                                   "gap_open", "gap_ext"))
def banded_align_trace_batch(queries: jax.Array, targets: jax.Array,
                             q_lens: jax.Array, t_lens: jax.Array,
                             band: int = 128, match: int = 5,
                             mismatch: int = -4, gap_open: int = 4,
                             gap_ext: int = 2):
    """Forward DP + on-device traceback in one launch.

    The (P, nq, W) move block never leaves the device: a second scan walks
    the path backwards from (nq, j_end), emitting one op per step
    (1=diag, 2=insertion, 3=deletion, 0=done).  H->E/F state switches are
    folded into the same emitting step (the E/F move bits of the *current*
    cell decide continuation), so the walk takes exactly
    path_length <= nq + nt steps.

    Returns (scores (P,), j_end (P,), j_start (P,), i_rem (P,),
    ops (P, n_ops) uint8 in walk order (from the path end backwards),
    edge (P,) bool — path visited band-local column 0 or W-1).

    The walk runs nq_max + W + 64 steps, not nq_max + nt_max: the path
    consumes exactly ql query chars (diag+ins) and its deletions are
    bounded by the band drift, so real paths fit comfortably; a pair
    whose path is longer (pathological all-deletion tails) finishes with
    ``i_rem > 0`` and the caller must realign it on the host
    (tpu_backend routes those through serial_align_many).
    Host-side record building: native c3_ops_record / ops_to_record.
    """
    P, nq_max = queries.shape
    _, nt_max = targets.shape
    W = band
    scores, j_end, moves = banded_align_batch(
        queries, targets, q_lens, t_lens, band=band, match=match,
        mismatch=mismatch, gap_open=gap_open, gap_ext=gap_ext)

    q_lens = q_lens.astype(jnp.int32)
    t_lens = t_lens.astype(jnp.int32)
    nq_pad = moves.shape[1]  # banded_align_batch pads rows to its unroll
    moves_flat = moves.reshape(P, nq_pad * W)
    parr = jnp.arange(P, dtype=jnp.int32)
    lo_of = band_lo_fn(q_lens, t_lens, W)

    def walk(carry, _):
        i, j, st, edge = carry
        active = i > 0
        lo_i = lo_of(i)
        k = j - lo_i
        edge = edge | (active & (((k == 0) & (lo_i > 0)) |
                                 ((k == W - 1) & (lo_i + W <= t_lens))))
        flat = (jnp.clip(i - 1, 0, nq_max - 1)) * W + jnp.clip(k, 0, W - 1)
        mv = moves_flat[parr, flat].astype(jnp.int32)
        src = mv & 3
        is_e = (st == 1) | ((st == 0) & (src == 1))
        is_f = (st == 2) | ((st == 0) & (src == 2))
        is_d = (st == 0) & (src == 0)
        op = jnp.where(
            active,
            jnp.where(is_d, OP_DIAG,
                      jnp.where(is_e, OP_INS, OP_DEL)),
            OP_NONE).astype(jnp.uint8)
        dec_i = active & (is_d | is_e)
        dec_j = active & (is_d | is_f)
        e_ext = (mv & 4) != 0
        f_ext = (mv & 8) != 0
        st_next = jnp.where(
            is_e & e_ext, 1,
            jnp.where(is_f & f_ext, 2, 0)).astype(jnp.int32)
        st_next = jnp.where(active, st_next, st)
        return (i - dec_i.astype(jnp.int32),
                j - dec_j.astype(jnp.int32), st_next, edge), op

    # unrolled walk: same per-step-overhead amortization as the forward scan
    UNROLL = 4
    n_steps = -(-(nq_max + W + 64) // UNROLL)

    def walk_u(carry, _):
        opss = []
        for _k in range(UNROLL):
            carry, op = walk(carry, None)
            opss.append(op)
        return carry, jnp.stack(opss, axis=1)                # (P, U)

    init = (q_lens, j_end.astype(jnp.int32),
            jnp.zeros(P, dtype=jnp.int32), jnp.zeros(P, dtype=bool))
    (i_f, j_f, _st, edge), ops = jax.lax.scan(walk_u, init, None,
                                              length=n_steps)
    ops = jnp.transpose(ops, (1, 0, 2)).reshape(P, n_steps * UNROLL)
    return scores, j_end, j_f, i_f, ops, edge


def ops_to_record(q: np.ndarray, t: np.ndarray, ops: np.ndarray,
                  j_end: int):
    """Python fallback: rebuild an AlignRecord from the walk ops."""
    from ..ref.banded import AlignRecord

    nq, nt = len(q), len(t)
    cover = np.zeros(nt, dtype=np.int8)
    base = np.full(nt, 4, dtype=np.int8)
    qpos = np.full(nt, -1, dtype=np.int32)
    ins_len = np.zeros(nt + 1, dtype=np.int32)
    ins_qstart = np.full(nt + 1, -1, dtype=np.int32)
    i, j = nq, int(j_end)
    for op in ops:
        if op == OP_NONE:
            break
        if op == OP_DIAG:
            cover[j - 1] = 1
            base[j - 1] = q[i - 1]
            qpos[j - 1] = i - 1
            i -= 1
            j -= 1
        elif op == OP_INS:
            ins_len[j] += 1
            ins_qstart[j] = i - 1
            i -= 1
        else:
            cover[j - 1] = 2
            j -= 1
    return AlignRecord(cover, base, qpos, ins_len, ins_qstart, j, int(j_end),
                       score=0)


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
