#!/usr/bin/env python3
"""Measure the Python/numpy penalty of the CPU proxy baseline.

The reference outsources its alignment inner loops to SIMD C tools
(conk/abPOA/racon); the proxy baseline (bench.py) runs the same
algorithms in numpy.  This microbench bounds the bias: the scalar-C
banded DP (native/dpbench.c, bit-identical scores) vs ref/banded.py's
numpy rows on identical inputs.

Usage: python tools/bias_bench.py [nq] [nt] [band] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from c3poa_tpu import native  # noqa: E402
from c3poa_tpu.ref.banded import banded_align  # noqa: E402


def main(nq=1024, nt=1024, band=128, reps=8):
    rng = np.random.default_rng(0)
    pairs = [(rng.integers(0, 4, size=nq).astype(np.int8),
              rng.integers(0, 4, size=nt).astype(np.int8))
             for _ in range(reps)]
    cells = nq * band * reps

    t0 = time.perf_counter()
    np_scores = [banded_align(q, t, band=band)[0] for q, t in pairs]
    t_np = time.perf_counter() - t0

    work = [np.empty(nt + 1, dtype=np.int64) for _ in range(4)]
    t0 = time.perf_counter()
    c_scores = [native.dp_score_c(q, t, band=band, work=work)[0]
                for q, t in pairs]
    t_c = time.perf_counter() - t0

    assert np_scores == c_scores, "C/numpy DP scores diverged"
    print(f"shape nq={nq} nt={nt} band={band} reps={reps}")
    print(f"numpy rows (ref/banded.py): {t_np:.3f}s "
          f"= {cells / t_np / 1e6:.1f} M band-cells/s")
    print(f"scalar C  (native/dpbench): {t_c:.3f}s "
          f"= {cells / t_c / 1e6:.1f} M band-cells/s")
    print(f"python-penalty bias: {t_np / t_c:.1f}x")
    return t_np / t_c


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
