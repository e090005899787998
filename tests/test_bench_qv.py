"""bench.py accuracy instrumentation: the fitting (infix) edit distance
and the QV-vs-ground-truth measurement (round-4 verdict item 3)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def _lev(a, b):
    D = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
    D[:, 0] = np.arange(len(a) + 1)
    D[0, :] = np.arange(len(b) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            D[i, j] = min(D[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                          D[i - 1, j] + 1, D[i, j - 1] + 1)
    return D[len(a), len(b)]


def test_fitting_edit_distance_vs_brute_force():
    from bench import fitting_edit_distance
    rng = np.random.default_rng(0)
    for _ in range(40):
        q = rng.integers(0, 4, size=rng.integers(1, 9)).astype(np.int8)
        t = rng.integers(0, 4, size=rng.integers(0, 14)).astype(np.int8)
        want = min((_lev(list(q), list(t[i:j]))
                    for i in range(len(t) + 1)
                    for j in range(i, len(t) + 1)), default=len(q))
        assert fitting_edit_distance(q, t) == want


def test_measure_qv_end_to_end(tmp_path):
    import bench
    from c3poa_tpu.pipeline.backend import NumpyBackend
    d = str(tmp_path)
    reads = bench.make_dataset(d, 8, seed=5)
    bench.run_once(d, os.path.join(d, "out"), NumpyBackend())
    qv = bench.measure_qv(os.path.join(d, "out"), reads)
    # 5% error, 5-15 copies: consensus must be far better than raw reads
    assert qv["qv_reads"] == 8
    assert qv["qv"] > 20.0
    assert qv["qv_bases"] > 0
