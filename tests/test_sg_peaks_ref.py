import numpy as np
import pytest
import scipy.signal

from c3poa_tpu.ref import sg, peaks


def test_sg_interior_matches_scipy_savgol():
    rng = np.random.default_rng(0)
    y = rng.normal(size=500)
    ours = sg.savitzky_golay(y, 41, 2)
    theirs = scipy.signal.savgol_filter(y, 41, 2)
    # identical away from the 20-sample edge regions (edge modes differ)
    np.testing.assert_allclose(ours[20:-20], theirs[20:-20], atol=1e-9)


def test_sg_preserves_linear_including_edges():
    # order-2 SG reproduces polynomials up to order 2 exactly; the reference
    # edge padding (y0 - |y[k]-y0| etc.) is a point reflection for monotone
    # data, which extends a line exactly.
    y = 0.5 * np.arange(300) + 3.0
    out = sg.savitzky_golay(y, 41, 2)
    np.testing.assert_allclose(out, y, atol=1e-8)
    out3 = sg.smooth3(y)
    np.testing.assert_allclose(out3, y, atol=1e-7)


@pytest.mark.parametrize("seed", range(8))
def test_find_peaks_matches_scipy_random(seed):
    rng = np.random.default_rng(seed)
    n = 400
    x = rng.normal(size=n).cumsum()
    for distance, height in [(5, None), (30, 0.0), (100, 1.0), (1, -10.0)]:
        h = -1e9 if height is None else height
        ours = peaks.find_peaks(x, distance=distance, height=h)
        theirs, _ = scipy.signal.find_peaks(x, distance=distance, height=h)
        np.testing.assert_array_equal(ours, theirs)


def test_find_peaks_plateaus_match_scipy():
    x = np.array([0, 1, 1, 1, 0, 2, 2, 0, 3, 0, 1, 1, 2, 2, 2, 1, 0],
                 dtype=float)
    ours = peaks.find_peaks(x, distance=1, height=-1)
    theirs, _ = scipy.signal.find_peaks(x, distance=1, height=-1)
    np.testing.assert_array_equal(ours, theirs)
    ours = peaks.find_peaks(x, distance=4, height=-1)
    theirs, _ = scipy.signal.find_peaks(x, distance=4, height=-1)
    np.testing.assert_array_equal(ours, theirs)


def test_find_peaks_equal_height_tie_matches_scipy():
    x = np.array([0, 5, 0, 5, 0, 5, 0], dtype=float)
    for d in (2, 3, 10):
        ours = peaks.find_peaks(x, distance=d, height=0)
        theirs, _ = scipy.signal.find_peaks(x, distance=d, height=0)
        np.testing.assert_array_equal(ours, theirs)


def test_call_peaks_noise_gate():
    rng = np.random.default_rng(2)
    flat = np.abs(rng.normal(5, 0.5, size=2000))
    sm = sg.smooth3(flat)
    p, _ = peaks.call_peaks(sm, min_dist=500)
    assert len(p) == 0  # max < 6*median -> gated out


def test_local_maxima_vectorized_matches_loop_oracle():
    """The vectorized local_maxima must match the literal scipy loop
    port on plateau-dense and smooth inputs (the docstring's claim)."""
    import numpy as np
    from c3poa_tpu.ref.peaks import local_maxima, local_maxima_loop
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 40))
        x = rng.integers(0, 4, size=n).astype(float)
        np.testing.assert_array_equal(local_maxima(x),
                                      local_maxima_loop(x))
    for _ in range(30):
        n = int(rng.integers(2, 1500))
        x = rng.normal(size=n)
        np.testing.assert_array_equal(local_maxima(x),
                                      local_maxima_loop(x))
    # edge plateaus: start/end runs never qualify
    for x in ([1, 1, 0], [0, 1, 1], [2, 2, 2], [0, 1, 1, 0, 2, 2],
              [0, 3, 3, 1, 3, 3, 0]):
        xa = np.array(x, dtype=float)
        np.testing.assert_array_equal(local_maxima(xa),
                                      local_maxima_loop(xa))
