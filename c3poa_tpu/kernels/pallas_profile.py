"""Pallas TPU kernel for the start-anchored splint score profile.

Same DP as kernels/sw_profile.py (the conk/BLAT-preprocess role), but with
the state resident in VMEM: the XLA scan formulation streams every (B, C, L)
intermediate through HBM (~1TB of traffic per big batch, dominated by the
per-row reverse running max), while this kernel reads each read tile once
and writes each profile tile once.

Decomposition: *overlapping tiles*.  A local alignment of an m-char splint
can span at most  m * (1 + match/gap)  target columns (score budget
m*match, each extra column costs >= gap), so G[.][j] only depends on read
chars within that horizon.  Each grid cell therefore computes the DP over
[tile_start, tile_end + OV) with a zero right boundary, OV >= horizon, and
keeps the exact core [tile_start, tile_end).  Tiles are fully independent —
no cross-tile carries, no sequential grid order.

The splint chars are scanned as SMEM scalars (dynamic *vector* lane
indexing is not supported by Mosaic); per-combo state lives in clean
(B_TILE, TILE_L + OV) 2D registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 30)

B_TILE = 8
TILE_L = 2048


def _round_up(x, n):
    return -(-x // n) * n


def _kernel(splints_ref, lens_ref, reads_ref, ext_ref, out_ref,
            *, match, mismatch, gap, m, C, W, OV, segs, n_ltiles, early, bt, tl):
    lt = pl.program_id(1)
    is_last = lt == n_ltiles - 1

    # tiles past every read's end are exact zeros (pad chars score 0 and
    # local scores clamp at 0): skip the whole DP.  Reads are chunked
    # length-sorted (tpu_backend.locate_many), so short-read batches in a
    # power-of-two length bucket skip most of their tiles.
    b0 = pl.program_id(0) * bt   # lens is an unblocked SMEM array
    lmax = lens_ref[b0]
    for b in range(1, bt):
        lmax = jnp.maximum(lmax, lens_ref[b0 + b])
    live = lt * tl < lmax

    @pl.when(jnp.logical_not(live))
    def _zeros():
        out_ref[:] = jnp.zeros((bt, C, tl), dtype=jnp.int32)

    @pl.when(live)
    def _dp():
        rd_main = reads_ref[:].astype(jnp.int32)          # (B_t, tl)
        rd_ext = ext_ref[:, :OV].astype(jnp.int32)        # (B_t, OV)
        # the last tile has no right neighbour: its extension is padding
        rd_ext2 = jnp.where(is_last, 4, rd_ext)
        rd = jnp.concatenate([rd_main, rd_ext2], axis=1)  # (B_t, W)

        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, W), 1)

        is_pad = rd == 4
        glane = gap * lane

        def make_row(c, levels):
            def row(t, carry):
                G_row, colmax = carry
                i = m - 1 - t
                sc = splints_ref[c * m + i]               # SMEM scalar
                sub = jnp.where((sc == 4) | is_pad, 0,
                                jnp.where(rd == sc, match, mismatch))
                # diag: G[i+1][j+1]; zero right boundary
                shifted = pltpu.roll(G_row, shift=W - 1, axis=1)
                shifted = jnp.where(lane == W - 1, 0, shifted)
                diag = shifted + sub
                up = G_row - gap
                T = jnp.maximum(jnp.maximum(diag, up), 0)
                # bounded-reach reverse running max (exact: reach >= horizon)
                A = T - glane
                if early:
                    # convergence early-exit: a doubling pass that changes
                    # nothing proves A[j] >= A[j + 2^k] for all j, and
                    # applying that twice gives A[j] >= A[j + 2^(k+1)] —
                    # every later pass is a no-op, so stopping at the
                    # fixpoint is bit-identical.  Row t has consumed t+1
                    # splint chars, so its gap reach is (t+1)*match//gap+1
                    # (the phased bound), used as the worst-case cap.
                    reach_t = jnp.minimum((t + 1) * match // gap + 1, W)

                    def _cond(st):
                        d_, _A, changed = st
                        return jnp.logical_and(d_ - 1 < reach_t, changed)

                    def _body(st):
                        d_, A_, _ = st
                        sh = pltpu.roll(A_, shift=W - d_, axis=1)
                        sh = jnp.where(lane < W - d_, sh, NEG)
                        A2 = jnp.maximum(A_, sh)
                        return d_ * 2, A2, jnp.any(A2 != A_)

                    _, A, _ = jax.lax.while_loop(
                        _cond, _body,
                        (jnp.int32(1), A, jnp.bool_(True)))
                else:
                    d = 1
                    for _ in range(levels):
                        sh = pltpu.roll(A, shift=W - d, axis=1)
                        sh = jnp.where(lane < W - d, sh, NEG)
                        A = jnp.maximum(A, sh)
                        d *= 2
                G_new = A + glane
                return G_new, jnp.maximum(colmax, G_new)
            return row

        Z = jnp.zeros((bt, W), dtype=jnp.int32)
        for c in range(C):
            carry = (Z, Z)
            # segs: static (t_start, t_end, levels) phases — early rows
            # have consumed few splint chars, so their score budget
            # bounds the gap reach and needs fewer closure levels
            for t0, t1, lv in segs:
                carry = jax.lax.fori_loop(t0, t1, make_row(c, lv), carry)
            _G, colmax = carry
            out_ref[:, c, :] = colmax[:, :tl]


@functools.partial(jax.jit,
                   static_argnames=("match", "mismatch", "gap", "interpret",
                                    "phased", "early", "b_tile", "tile_l"))
def start_profile_pallas(reads: jax.Array, splints: jax.Array,
                         lens: jax.Array | None = None,
                         match: int = 1, mismatch: int = -2, gap: int = 2,
                         interpret: bool = False,
                         phased: bool = False,
                         early: bool = False,
                         b_tile: int = B_TILE,
                         tile_l: int = TILE_L) -> jax.Array:
    """Drop-in replacement for start_profile_batch (bit-identical output).

    reads (B, L) int8 pad 4 with B % 8 == 0 and L % 2048 == 0;
    splints (C, m) int8 pad 4; lens (B,) int32 real read lengths (None =
    all L; only used to skip all-pad tiles).  Returns (B, C, L) int32.
    """
    B, L = reads.shape
    C, m = splints.shape
    assert B % b_tile == 0 and L % tile_l == 0, (B, L)
    nB, nL = B // b_tile, L // tile_l

    OV = min(_round_up(int(m * (gap + match) / gap) + 8, 128), tile_l)
    W = tile_l + OV

    def _levels_for(reach):
        lv = 1
        while (1 << lv) - 1 < min(reach, W):
            lv += 1
        return lv

    levels = _levels_for(m * match // gap + 1)
    if phased:
        # row t has consumed t+1 splint chars -> score budget
        # (t+1)*match -> exact per-row gap reach (t+1)*match//gap + 1;
        # group rows into static phases of equal closure level count
        # (~20% fewer closure ops at m=288, bit-identical output)
        segs, t0 = [], 0
        for t in range(m):
            lv = _levels_for((t + 1) * match // gap + 1)
            if not segs or segs[-1][2] != lv:
                if segs:
                    segs[-1] = (segs[-1][0], t, segs[-1][2])
                segs.append((t, m, lv))
        segs = tuple(segs)
    else:
        segs = ((0, m, levels),)

    splints_flat = splints.astype(jnp.int32).reshape(C * m)
    if lens is None:
        lens = jnp.full((B,), L, dtype=jnp.int32)
    lens = lens.astype(jnp.int32)

    if early:
        # the while-loop cond carries the per-row reach cap; one phase
        segs = ((0, m, levels),)
    kernel = functools.partial(
        _kernel, match=match, mismatch=mismatch, gap=gap, m=m, C=C,
        W=W, OV=OV, segs=segs, n_ltiles=nL, early=early,
        bt=b_tile, tl=tile_l)
    return pl.pallas_call(
        kernel,
        grid=(nB, nL),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_tile, tile_l), lambda b, l: (b, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, tile_l),
                         lambda b, l: (b, jnp.minimum(l + 1, nL - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_tile, C, tile_l),
                               lambda b, l: (b, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, L), jnp.int32),
        interpret=interpret,
    )(splints_flat, lens, reads, reads)
