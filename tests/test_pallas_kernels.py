"""Pallas kernels (interpret mode) vs the XLA/numpy references.

These kernels are the default accelerator paths (C3POA_USE_PALLAS=0
reverts to the XLA scans); parity is enforced here in interpret mode and
by tools/hw_parity.py on the live chip."""

import functools

import jax
import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.kernels.banded import banded_align_batch
from c3poa_tpu.kernels.pallas_banded import banded_fwd_pallas
from c3poa_tpu.kernels.pallas_profile import start_profile_pallas
from c3poa_tpu.ref import sw
from c3poa_tpu.utils import encode


def test_pallas_profile_matches_ref():
    rng = np.random.default_rng(0)
    B, L, C, m = 8, 4096, 2, 160
    R = np.full((B, L), 4, dtype=np.int8)
    lens = []
    for b in range(B):
        n = int(rng.integers(L // 2, L + 1))
        R[b, :n] = rng.integers(0, 4, n)
        lens.append(n)
    S = np.full((C, m), 4, dtype=np.int8)
    slens = []
    for c in range(C):
        sm = int(rng.integers(100, m + 1))
        S[c, :sm] = rng.integers(0, 4, sm)
        slens.append(sm)
    # plant real occurrences incl. one spanning a tile boundary (2048)
    R[0, 1990:1990 + slens[0]] = S[0, :slens[0]]
    R[1, 100:100 + slens[1]] = S[1, :slens[1]]
    prof = np.asarray(start_profile_pallas(R, S, interpret=True))
    for b in range(B):
        for c in range(C):
            want = sw.start_profile(S[c][:slens[c]], R[b][:lens[b]])
            np.testing.assert_array_equal(prof[b, c, :lens[b]], want,
                                          err_msg=f"b={b} c={c}")
    # phased closure (per-phase level counts) is bit-identical
    prof_p = np.asarray(start_profile_pallas(R, S, interpret=True,
                                             phased=True))
    np.testing.assert_array_equal(prof, prof_p)
    # fixpoint early-exit closure (while-loop) is bit-identical
    prof_e = np.asarray(start_profile_pallas(R, S, interpret=True,
                                             early=True))
    np.testing.assert_array_equal(prof, prof_e)


def test_pallas_profile_fat_tiles():
    # (b_tile, tile_l) = (16, 4096): the shipped accelerator config
    # (2.1x the (8, 2048) tiling on the v5e, see kernels/locate.py)
    # L = 2 * tile_l so the fat config has a REAL cross-tile seam at
    # 4096 (with L == tile_l, is_last is always true and the fat tile's
    # extension/OV path would never execute — round-2 advisor finding)
    rng = np.random.default_rng(3)
    B, L, C, m = 16, 8192, 1, 64
    R = np.full((B, L), 4, dtype=np.int8)
    lens = [int(rng.integers(L // 2, L + 1)) for _ in range(B)]
    for b, n in enumerate(lens):
        R[b, :n] = rng.integers(0, 4, n)
    S = rng.integers(0, 4, (C, m)).astype(np.int8)
    R[3, 2040:2040 + m] = S[0]  # occurrence spanning the narrow tile seam
    R[5, 4096 - m // 2:4096 + m - m // 2] = S[0]  # spans the FAT tile seam
    lens[3] = max(lens[3], 2040 + m)
    lens[5] = max(lens[5], 4096 + m)
    base = np.asarray(start_profile_pallas(R, S, interpret=True))
    fat = np.asarray(start_profile_pallas(R, S, interpret=True,
                                          phased=True,
                                          b_tile=16, tile_l=4096))
    np.testing.assert_array_equal(base, fat)
    # the planted seam-spanning occurrence must actually score as a full
    # match (+1/base) at its start position
    assert fat[5, 0, 4096 - m // 2] >= m - 1


import pytest


@pytest.mark.parametrize("p_tile,nh,sb,fold", [
    (16, 1, False, False), (32, 1, False, False), (16, 2, False, False),
    (32, 4, False, False),
    (8, 1, True, False), (16, 1, True, False), (32, 1, True, False),
    (8, 1, True, True), (16, 1, True, True)])
def test_pallas_banded_fwd_matches_xla(p_tile, nh, sb, fold):
    rng = np.random.default_rng(1)
    P, nq, nt, W = 8, 512, 512, 64
    Q = np.full((P, nq), 4, np.int8)
    T = np.full((P, nt), 4, np.int8)
    ql = np.zeros(P, np.int32)
    tl = np.zeros(P, np.int32)
    for p in range(P):
        n = int(rng.integers(300, nt))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.05, 0.03, 0.03)[:nq]
        T[p, :len(t)] = encode(t)
        tl[p] = len(t)
        Q[p, :len(q)] = encode(q)
        ql[p] = len(q)
    s1, j1, m1 = banded_align_batch(Q, T, ql, tl, band=W)
    s2, j2, m2 = banded_fwd_pallas(Q, T, ql, tl, band=W, interpret=True,
                                   p_tile=p_tile, nh=nh, superblock=sb,
                                   fold=fold)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    m1a, m2a = np.asarray(m1), np.asarray(m2)
    for p in range(P):
        np.testing.assert_array_equal(m1a[p, :ql[p]], m2a[p, :ql[p]],
                                      err_msg=f"pair {p}")


@pytest.mark.parametrize("p_tile", [16, 32])
def test_pallas_trace_matches_xla_trace(p_tile):
    """banded_align_trace_pallas == banded_align_trace_batch end to end
    (scores, ends, remaining rows, op walks)."""
    from c3poa_tpu.kernels.banded import banded_align_trace_batch
    from c3poa_tpu.kernels.pallas_banded import banded_align_trace_pallas

    rng = np.random.default_rng(3)
    P, nq, nt, W = 8, 256, 256, 64
    Q = np.full((P, nq), 4, np.int8)
    T = np.full((P, nt), 4, np.int8)
    ql = np.zeros(P, np.int32)
    tl = np.zeros(P, np.int32)
    for p in range(P):
        n = int(rng.integers(150, nt))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.05, 0.03, 0.03)[:nq]
        T[p, :len(t)] = encode(t)
        tl[p] = len(t)
        Q[p, :len(q)] = encode(q)
        ql[p] = len(q)
    s1, je1, js1, ir1, ops1, edge1 = banded_align_trace_batch(Q, T, ql, tl, band=W)
    s2, je2, js2, ir2, ops2, edge2 = banded_align_trace_pallas(
        Q, T, ql, tl, band=W, interpret=True, p_tile=p_tile)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(je1), np.asarray(je2))
    np.testing.assert_array_equal(np.asarray(js1), np.asarray(js2))
    np.testing.assert_array_equal(np.asarray(ir1), 0)
    np.testing.assert_array_equal(np.asarray(ir2), 0)
    o1, o2 = np.asarray(ops1), np.asarray(ops2)
    n = min(o1.shape[1], o2.shape[1])
    np.testing.assert_array_equal(o1[:, :n], o2[:, :n])
    assert not o1[:, n:].any() and not o2[:, n:].any()


def test_wide_walk_matches_plain_walk():
    """The two-word-row walk cache (wide=True, 16 substeps/gather)
    degaps to the plain walk's op stream and completes every pair at
    its shrink+2 budget on nanopore-grade error rates."""
    from c3poa_tpu.kernels.banded import (
        banded_align_trace_batch, unpack_ops_packed, walk_ops_cached)
    from c3poa_tpu.kernels.pallas_banded import banded_fwd_pallas_packed

    rng = np.random.default_rng(17)
    P, nq, nt, W = 8, 256, 256, 64
    Q = np.full((P, nq), 4, np.int8)
    T = np.full((P, nt), 4, np.int8)
    ql = np.zeros(P, np.int32)
    tl = np.zeros(P, np.int32)
    for p in range(P):
        n = int(rng.integers(150, nt))
        t = sim.random_seq(rng, n)
        err = 0.05 if p % 2 == 0 else 0.12  # incl. a high-error arm
        q = sim.mutate(rng, t, err, err * 0.6, err * 0.6)[:nq]
        T[p, :len(t)] = encode(t)
        tl[p] = len(t)
        Q[p, :len(q)] = encode(q)
        ql[p] = len(q)
    s1, je1, js1, ir1, ops1, edge1 = banded_align_trace_batch(Q, T, ql, tl, band=W)
    # jit the forward: an eager interpret-mode pallas_call dispatches the
    # kernel body op-by-op and takes minutes even at these toy shapes
    fwd = jax.jit(functools.partial(banded_fwd_pallas_packed, band=W,
                                    interpret=True))
    _s, je2, mvp = fwd(Q, T, ql, tl)
    np.testing.assert_array_equal(np.asarray(je1), np.asarray(je2))
    jw, iw, opsw, _edge = walk_ops_cached(mvp, ql, tl, je2, W, shrink=7,
                                   wide=True)
    np.testing.assert_array_equal(np.asarray(ir1), 0)
    iw = np.asarray(iw)
    o1, ow = np.asarray(ops1), np.asarray(opsw)
    done = 0
    for p in range(P):
        if iw[p] != 0:
            continue  # budget-exhausted pairs go to the host realigner
        done += 1
        dense = o1[p][o1[p] != 0]
        degap = unpack_ops_packed(ow[p])
        np.testing.assert_array_equal(dense, degap, err_msg=f"pair {p}")
        assert np.asarray(jw)[p] == np.asarray(js1)[p]
    assert done == P, f"only {done}/{P} pairs finished in budget"


def test_cached_walk_matches_plain_walk():
    """walk_ops_cached (packed, gapped, 4x fewer gathers) reproduces the
    plain walk's op stream after degapping, completes every pair at the
    default budget on nanopore-grade error rates, and its packed ops
    round-trip through both the C packed record builder and the Python
    unpack fallback."""
    from c3poa_tpu import native
    from c3poa_tpu.kernels.banded import (
        banded_align_trace_batch, ops_to_record, unpack_ops_packed)
    from c3poa_tpu.kernels.pallas_banded import (
        banded_align_trace_pallas_cached)
    from c3poa_tpu.ref.banded import normalize_record

    rng = np.random.default_rng(11)
    P, nq, nt, W = 8, 256, 256, 64
    Q = np.full((P, nq), 4, np.int8)
    T = np.full((P, nt), 4, np.int8)
    ql = np.zeros(P, np.int32)
    tl = np.zeros(P, np.int32)
    seqs = []
    for p in range(P):
        n = int(rng.integers(150, nt))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.05, 0.03, 0.03)[:nq]
        T[p, :len(t)] = encode(t)
        tl[p] = len(t)
        Q[p, :len(q)] = encode(q)
        ql[p] = len(q)
        seqs.append((encode(q), encode(t)))
    s1, je1, js1, ir1, ops1, edge1 = banded_align_trace_batch(Q, T, ql, tl, band=W)
    s2, je2, js2, ir2, ops2, edge2 = banded_align_trace_pallas_cached(
        Q, T, ql, tl, band=W, interpret=True)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(je1), np.asarray(je2))
    np.testing.assert_array_equal(np.asarray(ir2), 0)
    np.testing.assert_array_equal(np.asarray(js1), np.asarray(js2))
    o1, o2 = np.asarray(ops1), np.asarray(ops2)
    for p in range(P):
        dense = o1[p][o1[p] != 0]
        degap = unpack_ops_packed(o2[p])
        np.testing.assert_array_equal(dense, degap, err_msg=f"pair {p}")
        # record building: C packed path == python path on plain ops
        q, t = seqs[p]
        ref = normalize_record(
            ops_to_record(q, t, o1[p], int(np.asarray(je1)[p])), q, t)
        got = native.ops_record_normalize(
            q, t, o2[p], int(np.asarray(je2)[p]), packed=True)
        if got is not None:
            for f in ("cover", "base", "qpos", "ins_len", "ins_qstart"):
                np.testing.assert_array_equal(
                    getattr(ref, f), getattr(got, f), err_msg=f"{f} p={p}")
            assert ref.j_start == got.j_start
        gotb = native.ops_records_batch([q], [t], o2[p][None, :],
                                        [int(np.asarray(je2)[p])],
                                        packed=True)
        if gotb is not None:
            for f in ("cover", "base", "qpos", "ins_len", "ins_qstart"):
                np.testing.assert_array_equal(
                    getattr(ref, f), getattr(gotb[0], f),
                    err_msg=f"batch {f} p={p}")
