import numpy as np
import pytest

from c3poa_tpu.ref import sw
from c3poa_tpu.utils import encode
from c3poa_tpu import sim


@pytest.mark.parametrize("seed", range(5))
def test_local_colmax_matches_naive(seed):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 5, size=17).astype(np.int8)
    t = rng.integers(0, 5, size=53).astype(np.int8)
    np.testing.assert_array_equal(
        sw.local_colmax(q, t), sw.local_colmax_naive(q, t))


def test_local_colmax_perfect_match():
    rng = np.random.default_rng(0)
    t = rng.integers(0, 4, size=200).astype(np.int8)
    q = t[50:80].copy()
    colmax = sw.local_colmax(q, t)
    # best score = full query match ending at position 79
    assert colmax[79] == 30
    assert colmax.max() == 30


def test_start_profile_peaks_at_splint_starts():
    rng = np.random.default_rng(1)
    splint = sim.random_seq(rng, 120)
    read = sim.make_read(rng, "r", splint, insert_len=600, n_copies=3,
                         error=0.05, strand="+")
    q = encode(splint)
    t = encode(read.seq)
    prof = sw.start_profile(q, t)
    # expected splint starts: lead fragment is ~300bp, then every ~(120+600)
    # with 5% indel jitter.  Find profile argmax positions near them.
    # 4 splints total (n_copies copies + final splint)
    thresh = 0.5 * len(splint)
    above = prof >= thresh
    # count connected regions above threshold
    starts = np.flatnonzero(above & ~np.concatenate(([False], above[:-1])))
    assert len(starts) == 4
    # profile peak must be large vs background
    assert prof.max() > 6 * np.median(prof)


@pytest.mark.parametrize("seed", range(3))
def test_local_hits_matches_naive(seed):
    rng = np.random.default_rng(seed + 10)
    q = rng.integers(0, 5, size=11).astype(np.int8)
    t = rng.integers(0, 5, size=37).astype(np.int8)
    ref = sw.local_hits_naive(q, t)
    got = sw.local_hits(q, t)
    for a, b, name in zip(ref, got, ["colmax", "qend", "tstart", "qstart"]):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_local_hits_coords_exact_match():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, size=120).astype(np.int8)
    q = t[40:65].copy()
    colmax, qend, tstart, qstart = sw.local_hits(q, t)
    j = int(np.argmax(colmax))
    assert j == 64
    assert colmax[j] == 25
    assert qend[j] == 24
    assert tstart[j] == 40
    assert qstart[j] == 0
