import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.kernels.sw_profile import start_profile_batch
from c3poa_tpu.ref import sw
from c3poa_tpu.utils import encode
from c3poa_tpu.utils.seqs import revcomp


def pad_to(arr, n, fill=4):
    out = np.full(n, fill, dtype=np.int8)
    out[:len(arr)] = arr
    return out


@pytest.mark.parametrize("seed", range(3))
def test_profile_batch_matches_ref(seed):
    rng = np.random.default_rng(seed)
    L, m = 512, 48
    reads, lens = [], []
    for _ in range(4):
        n = int(rng.integers(L // 2, L + 1))
        reads.append(pad_to(rng.integers(0, 4, n).astype(np.int8), L))
        lens.append(n)
    splints = [rng.integers(0, 4, int(rng.integers(m // 2, m + 1))).astype(np.int8)
               for _ in range(2)]
    spl = np.stack([pad_to(s, m) for s in splints])

    prof = np.asarray(start_profile_batch(np.stack(reads), spl))
    for b in range(4):
        for c in range(2):
            want = sw.start_profile(splints[c], reads[b][:lens[b]])
            np.testing.assert_array_equal(
                prof[b, c, :lens[b]], want,
                err_msg=f"read {b} combo {c}")
            # padding region contributes nothing
            assert (prof[b, c, lens[b]:] >= 0).all()


def test_profile_batch_real_splint_geometry():
    rng = np.random.default_rng(42)
    splint = sim.random_seq(rng, 120)
    read = sim.make_read(rng, "r", splint, insert_len=500, n_copies=3,
                         error=0.05, strand="-")
    t = encode(read.seq)
    L = 4096
    spl = np.stack([pad_to(encode(splint), 128),
                    pad_to(encode(revcomp(splint)), 128)])
    prof = np.asarray(start_profile_batch(pad_to(t, L)[None, :], spl))
    # strand '-' means the revcomp splint (combo 1) matches
    assert prof[0, 1].max() > prof[0, 0].max()
    want = sw.start_profile(encode(revcomp(splint)), t)
    np.testing.assert_array_equal(prof[0, 1, :len(t)], want)
