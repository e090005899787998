"""Batched start-anchored local SW score profiles (device kernel).

The conk + BLAT-preprocess replacement (see ``ref/sw.py`` for the spec and
reference implementation): one launch scores a whole batch of reads against
every (splint, strand) combo and returns the per-position score profiles
whose peaks mark splint starts.

Formulation (TPU-friendly):
- ``ref.sw.start_profile`` runs the end-anchored local DP on *reversed*
  arrays.  Reversing padded batches would move padding to the head, so this
  kernel instead runs the mirrored recurrence directly in forward
  coordinates, scanning splint positions from last to first:

      G[i][j] = max(0, G[i+1][j+1] + s(i,j), G[i+1][j] - gap, G[i][j+1] - gap)

  where G[i][j] is the best local score of (splint suffix from i) vs
  (target suffix from j); then profile[j] = max_i G[i][j].
- the in-row term G[i][j+1] (an unbounded gap run) is resolved with a
  *reverse* running max:  G[i] = revcummax(T + gap*j) - gap*j with
  T = max(0, diag, up), exact for linear gap penalties
  (same identity as ref.sw.local_colmax, mirrored).
- padding (code 4) scores 0 against everything, so padded tails can never
  contribute score; profile entries beyond each read's length are 0.

The scan axis is the splint length (~300 steps); every step is elementwise
work on a (B, C, L) block plus one log-depth reverse cummax — all VPU
shapes, fully batched over reads x combos.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = jnp.int32(-(2 ** 30))


@partial(jax.jit, static_argnames=("match", "mismatch", "gap"))
def start_profile_batch(reads: jax.Array, splints: jax.Array,
                        match: int = 1, mismatch: int = -2, gap: int = 2
                        ) -> jax.Array:
    """reads: (B, L) int8 padded with 4; splints: (C, m) int8 padded with 4
    at the END.  Returns profiles (B, C, L) int32.

    Matches ``ref.sw.start_profile(splint, read)`` exactly on the valid
    region for every (read, combo) pair.
    """
    B, L = reads.shape
    C, m = splints.shape
    reads = reads.astype(jnp.int32)
    splints = splints.astype(jnp.int32)
    jarr = jnp.arange(L, dtype=jnp.int32) * gap  # (L,)
    # the reverse running max only needs reach m*match/gap: beyond that,
    # T[k] - gap*(k-j) < 0 <= T[j] can never win (T >= 0), so the doubling
    # stops early — these full-(B,C,L) passes dominate HBM traffic
    reach = m * match // gap + 1
    max_shift = min(reach, L)

    def step(carry, sc):
        G, colmax = carry
        # sc: (C,) splint chars for this row (scanned last -> first)
        r = reads[:, None, :]                        # (B, 1, L)
        q = sc[None, :, None]                        # (1, C, 1)
        sub = jnp.where((q == 4) | (r == 4), 0,
                        jnp.where(q == r, match, mismatch))
        # diag: G[i+1][j+1] -> shift left along j, pad 0 at the end
        diag = jnp.pad(G[:, :, 1:], ((0, 0), (0, 0), (0, 1))) + sub
        up = G - gap
        T = jnp.maximum(jnp.maximum(diag, up), 0)
        # reverse running max handles G[i][j+1] - gap runs exactly:
        # G[j] = max_{k>=j} (T[k] - gap*(k-j)) = revcummax(T - gap*k)[j] + gap*j
        # (manual doubling with static shifts — associative_scan lowers to
        # slower code on TPU)
        A = T - jarr[None, None, :]
        d = 1
        while d < max_shift:
            A = jnp.maximum(
                A, jnp.pad(A[:, :, d:], ((0, 0), (0, 0), (0, d)),
                           constant_values=NEG))
            d *= 2
        Gnew = A + jarr[None, None, :]
        colmax = jnp.maximum(colmax, Gnew)
        return (Gnew, colmax), None

    G0 = jnp.zeros((B, C, L), dtype=jnp.int32)
    colmax0 = jnp.zeros((B, C, L), dtype=jnp.int32)
    # scan splint chars last -> first; padded tail chars are 4 (neutral):
    # they leave G at 0, so padding length is harmless.
    chars = splints.T[::-1]                          # (m, C)
    # unroll rows per scan step: carries are (B, C, L)-sized and round-trip
    # HBM once per step, which dominates at large L
    UNROLL = 4
    if m % UNROLL:
        # pad rows must be processed FIRST (neutral chars leave G == 0);
        # processed last they would shift the profile by one column each
        pad = UNROLL - m % UNROLL
        chars = jnp.concatenate(
            [jnp.full((pad, C), 4, dtype=chars.dtype), chars], axis=0)

    def step_u(carry, sc4):
        for k in range(UNROLL):
            carry, _ = step(carry, sc4[k])
        return carry, None

    (_, colmax), _ = jax.lax.scan(
        step_u, (G0, colmax0),
        chars.reshape(-1, UNROLL, C))
    return colmax
