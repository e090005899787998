import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.kernels.peaks import call_peaks_batch, masked_median
from c3poa_tpu.kernels.smooth import smooth3_batch
from c3poa_tpu.ref import peaks as ref_peaks
from c3poa_tpu.ref import sg as ref_sg
from c3poa_tpu.ref import sw as ref_sw
from c3poa_tpu.utils import encode


def batch_of_profiles(seed=0, n=4, L=4096):
    """Realistic conk-role score profiles of varying lengths."""
    rng = np.random.default_rng(seed)
    splint = sim.random_seq(rng, 120)
    rows, lens = [], []
    for i in range(n):
        read = sim.make_read(rng, f"r{i}", splint,
                             insert_len=int(rng.integers(400, 800)),
                             n_copies=int(rng.integers(2, 5)), error=0.06)
        prof = ref_sw.start_profile(encode(splint), encode(read.seq))
        row = np.zeros(L, dtype=np.float32)
        ln = min(len(prof), L)
        row[:ln] = prof[:ln]
        rows.append(row)
        lens.append(ln)
    return np.stack(rows), np.array(lens, dtype=np.int32)


def test_smooth3_matches_reference():
    scores, lens = batch_of_profiles()
    out = np.asarray(smooth3_batch(scores, lens))
    for b in range(len(lens)):
        want = ref_sg.smooth3(scores[b, :lens[b]].astype(np.float64))
        got = out[b, :lens[b]]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
        assert (out[b, lens[b]:] == 0).all()


def test_masked_median_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 100)).astype(np.float32)
    lens = np.array([100, 57, 8], dtype=np.int32)
    got = np.asarray(masked_median(x, lens))
    for b in range(3):
        np.testing.assert_allclose(got[b], np.median(x[b, :lens[b]]), rtol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_call_peaks_batch_matches_ref(seed):
    scores, lens = batch_of_profiles(seed=seed)
    sm = np.asarray(smooth3_batch(scores, lens))
    min_dist = 300
    pos, n, med = call_peaks_batch(sm, lens, min_dist)
    pos, n, med = np.asarray(pos), np.asarray(n), np.asarray(med)
    for b in range(len(lens)):
        # feed the identical (f32-smoothed) values to the reference rules
        want, want_med = ref_peaks.call_peaks(
            sm[b, :lens[b]].astype(np.float64), min_dist)
        got = pos[b, :n[b]]
        np.testing.assert_array_equal(got, want, err_msg=f"row {b}")
        np.testing.assert_allclose(med[b], want_med, rtol=1e-5)


def test_call_peaks_batch_gates_junk():
    rng = np.random.default_rng(9)
    splint = sim.random_seq(rng, 120)
    junk = sim.random_seq(rng, 3000)
    prof = ref_sw.start_profile(encode(splint), encode(junk)).astype(np.float32)
    L = 4096
    row = np.zeros((1, L), dtype=np.float32)
    row[0, :len(prof)] = prof
    lens = np.array([len(prof)], dtype=np.int32)
    sm = smooth3_batch(row, lens)
    pos, n, _ = call_peaks_batch(np.asarray(sm), lens, 300)
    assert int(np.asarray(n)[0]) == 0


def test_call_peaks_batch_three_deep_chain():
    """Constructed 3-deep elimination chain INSIDE one tile: the tile's
    top-2 candidates are both eliminated by stronger peaks in adjacent
    tiles, and only the tile's THIRD candidate survives scipy's
    selection.  The per-read deep flag must trigger the exact host
    rerun, making the device path scipy-exact (closes PARITY.md §9)."""
    from c3poa_tpu.kernels.peaks import peak_candidates_batch

    L, dist = 128, 33          # tile_for_distance(33) == 32
    x = np.zeros((1, L), dtype=np.float32)
    # tile [32, 64): c1@33 h50, c2@62 h40, c3@48 h30 (the survivor)
    # neighbors: n1@10 h60 (tile 0) kills c1; n2@90 h55 (tile 2) kills c2
    for p, h in [(10, 60), (33, 50), (48, 30), (62, 40), (90, 55)]:
        x[0, p] = h
    lens = np.array([L], dtype=np.int32)

    want, _ = ref_peaks.call_peaks(x[0].astype(np.float64), dist)
    assert list(want) == [10, 48, 90]  # the chain really is 3-deep

    # the detector must fire for this row
    *_rest, deep, _marg = peak_candidates_batch(x, lens, tile=32)
    assert bool(np.asarray(deep)[0])

    pos, n, _ = call_peaks_batch(x, lens, dist)
    pos, n = np.asarray(pos), np.asarray(n)
    np.testing.assert_array_equal(pos[0, :n[0]], want)


def test_call_peaks_batch_plateaus_and_ties():
    # synthetic rows with plateaus and equal-height peaks
    L = 256
    x = np.zeros((2, L), dtype=np.float32)
    x[0, 10:13] = 5.0   # plateau -> midpoint 11
    x[0, 100] = 7.0
    x[1, 20] = 5.0
    x[1, 40] = 5.0      # equal heights, distance selection tie
    x[1, 60] = 5.0
    lens = np.array([L, L], dtype=np.int32)
    for dist in (5, 25, 100):
        pos, n, _ = call_peaks_batch(x, lens, dist)
        pos, n = np.asarray(pos), np.asarray(n)
        for b in range(2):
            want = ref_peaks.find_peaks(x[b].astype(np.float64),
                                        distance=dist, height=-1e30)
            # rows here have median 0 -> height threshold 0, gate passes
            want = want[x[b][want] >= 0]
            np.testing.assert_array_equal(pos[b, :n[b]], want,
                                          err_msg=f"b={b} dist={dist}")


def test_exact_peaks_rerun_matches_numpy_backend():
    """ref.peaks.exact_peaks_rerun — the ONE shared deep-flag host path
    (used by tpu_backend.locate_many and kernels/locate.locate_batch) —
    must equal the NumpyBackend locate recipe (profile -> smooth3 ->
    call_peaks) on real-shaped reads, padded or unpadded splint alike
    (N/pad scores 0, so trailing pad never changes the profile)."""
    from c3poa_tpu import sim
    from c3poa_tpu.pipeline.backend import Combo, NumpyBackend
    from c3poa_tpu.ref.peaks import exact_peaks_rerun
    from c3poa_tpu.utils.seqs import encode

    rng = np.random.default_rng(31)
    reads, splints = sim.make_dataset(n_reads=4, seed=31,
                                      insert_len=(300, 600),
                                      copies=(3, 6), error=0.05)
    (sname, sseq), = splints.items()
    scodes = encode(sseq)
    combos = [Combo(sname, "+", scodes, len(scodes))]
    codes = [encode(r.seq) for r in reads]
    want = NumpyBackend().locate_many(codes, combos, len(scodes) // 2)
    for c, w in zip(codes, want):
        got = exact_peaks_rerun(c, scodes, len(scodes) // 2)
        np.testing.assert_array_equal(got, w.peaks)
        padded = np.full(len(scodes) + 37, 4, dtype=np.int8)
        padded[:len(scodes)] = scodes
        got_p = exact_peaks_rerun(c, padded, len(scodes) // 2)
        np.testing.assert_array_equal(got_p, w.peaks)


def test_margin_guard_near_threshold_peak():
    """A peak whose height sits within 1e-5 relative of the 3x-median
    acceptance threshold (the f32-vs-f64 flip zone, VERDICT r4 item 7)
    must raise the ``margin`` flag and take the exact host rerun, so the
    result matches the f64 reference rules bit-for-bit."""
    from c3poa_tpu.kernels.peaks import peak_candidates_batch
    from c3poa_tpu.utils import prof

    L = 128
    x = np.ones((1, L), dtype=np.float32)      # median == 1.0 exactly
    x[0, 80] = 10.0                            # passes the 6x gate
    x[0, 30] = np.float32(3.0 * (1.0 + 1e-6))  # within 1e-4 of 3*median
    lens = np.array([L], dtype=np.int32)

    *_rest, deep, marg = peak_candidates_batch(x, lens, tile=32)
    assert not bool(np.asarray(deep)[0])
    assert bool(np.asarray(marg)[0])

    prof.reset()
    want, _ = ref_peaks.call_peaks(x[0].astype(np.float64), 33)
    pos, n, _ = call_peaks_batch(x, lens, 33)
    pos, n = np.asarray(pos), np.asarray(n)
    np.testing.assert_array_equal(pos[0, :n[0]], want)
    assert prof.current.counts.get("peaks_margin_host_rerun", 0) == 1


def test_margin_guard_near_gate():
    """xmax within the f32 margin of the 6x-median noise gate flags the
    read; far from it (either side) does not."""
    from c3poa_tpu.kernels.peaks import peak_candidates_batch

    L = 128
    rows = np.ones((3, L), dtype=np.float32)
    rows[0, 64] = np.float32(6.0 * (1.0 - 1e-6))   # just under the gate
    rows[1, 64] = 5.0                              # clearly gated
    rows[2, 64] = 10.0                             # clearly open
    lens = np.full(3, L, dtype=np.int32)
    *_rest, _deep, marg = peak_candidates_batch(rows, lens, tile=32)
    marg = np.asarray(marg)
    assert bool(marg[0]) and not bool(marg[1]) and not bool(marg[2])


def test_margin_guard_competitor_order():
    """Two surviving candidates with near-equal f32 heights: their
    by-height selection priority could invert in f64, so the host-side
    competitor check must flag the read."""
    from c3poa_tpu.kernels.peaks import margin_competitors_host

    cand_pos = np.array([[10, 70, -1], [10, 70, -1]], dtype=np.int32)
    cand_h = np.array([[5.0, 5.0 * (1.0 + 1e-6), 0.0],
                       [5.0, 7.0, 0.0]], dtype=np.float32)
    got = margin_competitors_host(cand_pos, cand_h)
    assert bool(got[0]) and not bool(got[1])


def test_margin_competitor_interaction_filter():
    """A near-equal pair that cannot interact (>= distance apart, no
    third candidate within distance of either) is safely skipped; the
    same pair WITH a nearby third candidate still flags."""
    from c3poa_tpu.kernels.peaks import margin_competitors_host

    iso = np.array([[100, 900, -1]], dtype=np.int32)
    h = np.array([[5.0, 5.0 * (1.0 + 1e-7), 0.0]], dtype=np.float32)
    assert not bool(margin_competitors_host(iso, h, 300)[0])
    # pair itself closer than distance: order decides which survives
    close = np.array([[100, 250, -1]], dtype=np.int32)
    assert bool(margin_competitors_host(close, h, 300)[0])
    # third candidate within distance of one member
    three = np.array([[100, 900, 1050]], dtype=np.int32)
    h3 = np.array([[5.0, 5.0 * (1.0 + 1e-7), 7.0]], dtype=np.float32)
    assert bool(margin_competitors_host(three, h3, 300)[0])
    # min_dist=0 (no interaction info): conservative flag stays
    assert bool(margin_competitors_host(iso, h, 0)[0])


def test_margin_guard_structure_flip():
    """Adjacent above-threshold values inside the f32 structure flip
    zone (a near-tied apex pair) must raise the margin flag; a clearly
    separated apex must not."""
    from c3poa_tpu.kernels.peaks import peak_candidates_batch

    L = 128
    rows = np.ones((2, L), dtype=np.float32)
    rows[0, 60] = 8.0
    rows[0, 61] = np.float32(8.0 + 1e-5)   # inside STRUCT_ATOL
    rows[1, 60] = 8.0
    rows[1, 61] = 7.0                      # clearly separated
    lens = np.full(2, L, dtype=np.int32)
    *_rest, _deep, marg = peak_candidates_batch(rows, lens, tile=32)
    marg = np.asarray(marg)
    assert bool(marg[0]) and not bool(marg[1])
