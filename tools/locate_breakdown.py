#!/usr/bin/env python3
"""Decompose the locate stage's per-group cost on the live chip:
batch assembly, host->device upload, kernel, candidate download, host
selection.  Guides which part to attack (round-3 stage profile put the
whole stage at ~1.1 s/group vs ~0.12 s of kernel time).

Usage: python tools/locate_breakdown.py [B=512] [L=16384]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def t(fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    import jax
    from c3poa_tpu import sim
    from c3poa_tpu.kernels.locate import locate_device, pack_b5
    from c3poa_tpu.kernels.peaks import select_peaks_host
    from c3poa_tpu.utils.seqs import encode

    rng = np.random.default_rng(0)
    reads = []
    for _ in range(B):
        n = int(rng.integers(L // 2, L))
        reads.append(encode(sim.random_seq(rng, n)))
    S = np.asarray(rng.integers(0, 4, (2, 224)), dtype=np.int8)
    lens = np.array([len(r) for r in reads], dtype=np.int32)

    def assemble():
        R = np.full((B, L), 4, dtype=np.int8)
        for r, codes in enumerate(reads):
            R[r, :len(codes)] = codes
        return R

    R = assemble()
    print(f"B={B} L={L} upload bytes={R.nbytes/1e6:.1f}MB")
    print(f"assemble:        {t(assemble)*1e3:8.1f} ms")
    print(f"pack_b5:         {t(lambda: pack_b5(R))*1e3:8.1f} ms")
    Rp = pack_b5(R)
    print(f"upload raw:      "
          f"{t(lambda: jax.device_put(R).block_until_ready())*1e3:8.1f} ms")
    print(f"upload packed:   "
          f"{t(lambda: jax.device_put(Rp).block_until_ready())*1e3:8.1f} ms")

    def kernel(inp, unpack_l=None):
        res = locate_device(inp, lens, S, unpack_l=unpack_l)
        return [np.asarray(x) for x in res]

    # fresh numpy input each call so no caching; includes upload
    print(f"kernel+up raw:   {t(lambda: kernel(R.copy()))*1e3:8.1f} ms")
    print(f"kernel+up pack:  "
          f"{t(lambda: kernel(pack_b5(R), L))*1e3:8.1f} ms")
    out = locate_device(R, lens, S)
    cp, ch = np.asarray(out[2]), np.asarray(out[3])
    print(f"host selection:  "
          f"{t(lambda: select_peaks_host(cp, ch, 400))*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
