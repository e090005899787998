"""Parity tests: C fast paths vs the pure-Python implementations."""

import numpy as np
import pytest

from c3poa_tpu import native, sim
from c3poa_tpu.consensus.engine import ConsensusParams, serial_align_many
from c3poa_tpu.consensus.vote import record_for_draft, vote_consensus
from c3poa_tpu.kernels.banded import banded_align_batch, traceback_banded
from c3poa_tpu.ref import banded as ref_banded
from c3poa_tpu.utils import encode

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def pad_to(arr, n, fill=4):
    out = np.full(n, fill, dtype=np.int8)
    out[:len(arr)] = arr
    return out


@pytest.mark.parametrize("seed", range(3))
def test_native_traceback_matches_python(seed):
    rng = np.random.default_rng(seed)
    t = encode(sim.random_seq(rng, 300))
    q = encode(sim.mutate(rng, "".join("ACGTN"[c] for c in t), 0.05, 0.02, 0.02))
    W = 64
    s, je, mv = banded_align_batch(
        q[None, :], t[None, :], np.array([len(q)], np.int32),
        np.array([len(t)], np.int32), band=W)
    mv = np.asarray(mv)[0]
    je = int(np.asarray(je)[0])

    py = traceback_banded(q, t, mv, je, W)
    py = ref_banded.normalize_record(py, q, t)
    c = native.traceback_normalize(q, t, mv, je, W)
    for a, b, name in zip(c[:5], py[:5],
                          ["cover", "base", "qpos", "ins_len", "ins_qstart"]):
        np.testing.assert_array_equal(a, b, err_msg=name)
    assert c.j_start == py.j_start


@pytest.mark.parametrize("seed", range(3))
def test_native_vote_matches_python(seed):
    rng = np.random.default_rng(seed + 50)
    truth = sim.random_seq(rng, 400)
    draft = encode(sim.mutate(rng, truth, 0.03, 0.015, 0.015))
    dq = rng.integers(3, 40, len(draft)).astype(np.int8)
    p = ConsensusParams()
    pairs = []
    for _ in range(5):
        s = encode(sim.mutate(rng, truth, 0.04, 0.02, 0.02))
        pairs.append((s, rng.integers(3, 40, len(s)).astype(np.int8), draft))
    alns = [record_for_draft(draft, dq)] + serial_align_many(pairs, p)
    want = vote_consensus(len(draft), alns, qmin=5, use_native=False)
    got = native.vote_consensus_c(len(draft), alns, qmin=5)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_native_fastq_parse():
    data = b"@read1 comment\nACGTN\n+\nIIIII\n@read2\nacgt\n+\n!!!!\n"
    res = native.parse_fastq_bytes(data)
    names, seqs, quals, offs = res
    assert names == ["read1", "read2"]
    np.testing.assert_array_equal(seqs[offs[0]:offs[1]], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(seqs[offs[1]:offs[2]], [0, 1, 2, 3])
    np.testing.assert_array_equal(quals[offs[0]:offs[1]], [40] * 5)
    np.testing.assert_array_equal(quals[offs[1]:offs[2]], [0] * 4)


def test_dp_score_c_matches_numpy():
    """native/dpbench.c scores are bit-identical to ref.banded.banded_align
    (same band placement, same tie rules) across shapes and bands."""
    from c3poa_tpu import native
    from c3poa_tpu.ref.banded import banded_align

    if native.get_lib() is None or \
            not hasattr(native.get_lib(), "c3_dp_score"):
        import pytest
        pytest.skip("native dp bench not built")
    rng = np.random.default_rng(11)
    for _ in range(40):
        nq = int(rng.integers(10, 300))
        nt = int(rng.integers(10, 400))
        band = int(rng.choice([8, 16, 64, 128]))
        q = rng.integers(0, 5, size=nq).astype(np.int8)
        t = rng.integers(0, 4, size=nt).astype(np.int8)
        s_np, j_np, _, _ = banded_align(q, t, band=band)
        s_c, j_c = native.dp_score_c(q, t, band=band)
        assert (s_c, j_c) == (int(s_np), int(j_np)), (nq, nt, band)


def test_band_edge_f_clip_consistent_and_no_crash():
    """High-error long pairs (the shape that exposed the round-3 crash):
    F-gap chains must be clipped at the band edge in EVERY
    implementation — numpy spec, XLA scan, and the C aligner must agree
    on scores, and the C traceback must stay inside its buffers (the
    unclipped spec let walks exit the band: heap corruption)."""
    from c3poa_tpu import sim
    from c3poa_tpu.kernels.banded import banded_align_trace_batch
    from c3poa_tpu.ref.banded import align_and_trace
    from c3poa_tpu.utils.seqs import encode

    rng = np.random.default_rng(11)
    for trial in range(6):
        n = int(rng.integers(2000, 5000))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.04, 0.02, 0.02)
        qa, ta = encode(q), encode(t)
        rec = align_and_trace(qa, ta, band=128)
        s, je, _js, ir, _ops, _edge = banded_align_trace_batch(
            qa[None, :], ta[None, :],
            np.array([len(qa)], np.int32), np.array([len(ta)], np.int32),
            band=128)
        assert int(np.asarray(s)[0]) == rec.score, trial
        assert int(np.asarray(ir)[0]) == 0
        if hasattr(native.get_lib() or 0, "c3_align_moves"):
            rc = native.align_and_trace_c(qa, ta, band=128)
            assert rc.score == rec.score, trial
            np.testing.assert_array_equal(rc.cover, rec.cover)
            np.testing.assert_array_equal(rc.ins_len, rec.ins_len)


def test_align_and_trace_c_matches_numpy():
    """native/align.c full aligner (forward moves + C traceback +
    normalization) emits records bit-identical to ref.banded
    .align_and_trace across shapes, bands and edge cases — it is the
    NumpyBackend/serial_align_many hot path, so any divergence would
    silently change CPU-backend consensus output."""
    from c3poa_tpu import sim
    from c3poa_tpu.ref.banded import AlignRecord, align_and_trace
    from c3poa_tpu.utils.seqs import encode

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "c3_align_moves"):
        pytest.skip("native aligner not built")
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(30):
        n = int(rng.integers(20, 900))
        t = sim.random_seq(rng, n)
        q = sim.mutate(rng, t, 0.08, 0.04, 0.04)
        cases.append((encode(q), encode(t), int(rng.choice([16, 64, 128]))))
    # edge cases: N codes, tiny sequences, homopolymers (normalization),
    # length-mismatched pairs up to the engine's nt <= 3*nq guarantee
    cases.append((np.array([0, 4, 2, 4, 1], np.int8),
                  np.array([0, 1, 2, 4, 1, 3], np.int8), 8))
    cases.append((encode("AAAAAAGAAAA"), encode("AAAAAAAGAAAAA"), 8))
    cases.append((encode("ACG"), encode("ACGACGACG"), 4))
    for qa, ta, W in cases:
        r1 = align_and_trace(qa, ta, band=W)
        r2 = native.align_and_trace_c(qa, ta, band=W)
        assert r2 is not None
        for f in AlignRecord._fields:
            a, b = getattr(r1, f), getattr(r2, f)
            if isinstance(a, np.ndarray):
                np.testing.assert_array_equal(a, b, err_msg=f)
            else:
                assert a == b, (f, a, b)


@pytest.mark.parametrize("seed", range(3))
def test_native_vote_jobs_matches_per_job(seed):
    """c3_vote_jobs (batched, threaded, implicit draft voter) must equal
    the per-job python vote for every job: varied voter counts (incl. a
    draft-only job), insertions, qmin gating, and N bases."""
    if not hasattr(native.get_lib(), "c3_vote_jobs"):
        pytest.skip("batched vote symbol not built")
    rng = np.random.default_rng(seed + 90)
    p = ConsensusParams()
    job_voters, drafts, draft_qs, want = [], [], [], []
    for j in range(12):
        truth = sim.random_seq(rng, int(rng.integers(80, 500)))
        draft = encode(sim.mutate(rng, truth, 0.04, 0.02, 0.02))
        if rng.random() < 0.2:  # sprinkle N bases into the draft
            draft[rng.integers(0, len(draft), 3)] = 4
        dq = rng.integers(0, 40, len(draft)).astype(np.int8)
        nv = int(rng.integers(0, 7))  # 0 = draft-only job
        pairs = []
        for _ in range(nv):
            s = encode(sim.mutate(rng, truth, 0.05, 0.025, 0.025))
            pairs.append((s, rng.integers(0, 40, len(s)).astype(np.int8),
                          draft))
        voters = serial_align_many(pairs, p)
        job_voters.append(voters)
        drafts.append(draft)
        draft_qs.append(dq)
        alns = [record_for_draft(draft, dq)] + voters
        want.append(vote_consensus(len(draft), alns, qmin=5,
                                   use_native=False))
    got = native.vote_jobs_c(job_voters, drafts, draft_qs, qmin=5)
    assert got is not None
    for j, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g[0], w[0], err_msg=f"job {j} codes")
        np.testing.assert_array_equal(g[1], w[1], err_msg=f"job {j} quals")


def test_arena_slot_lease_guard():
    """The record-arena double-buffer discipline is ENFORCED, not just
    conventional: claiming a slot whose previous generation is still
    live raises (the round-2 gi%2-under-multihost bug class), releasing
    frees it, and stale lease tokens are ignored."""
    s0 = native.claim_arena_slot(0)
    s1 = native.claim_arena_slot(1)  # other slot is independent
    with pytest.raises(native.ArenaSlotCollision):
        native.claim_arena_slot(0)
    native.release_arena_slot(0, s0)
    s0b = native.claim_arena_slot(0)  # free after release
    native.release_arena_slot(0, s0)  # stale token: no-op
    with pytest.raises(native.ArenaSlotCollision):
        native.claim_arena_slot(0)    # s0b still holds the slot
    native.release_arena_slot(0, s0b)
    native.release_arena_slot(1, s1)


def test_pipeline_releases_arena_leases(tmp_path):
    """A pipeline run claims and releases cleanly (no leaked leases)."""
    from c3poa_tpu.pipeline.run import PipelineConfig, run_pipeline

    reads, splints = sim.make_dataset(
        n_reads=6, seed=11, insert_len=(500, 900), copies=(2, 5),
        error=0.05)
    sim.write_fastq(str(tmp_path / "reads.fastq"), reads)
    sim.write_fasta(str(tmp_path / "splint.fasta"), splints)
    stats = run_pipeline(str(tmp_path / "reads.fastq"),
                         str(tmp_path / "splint.fasta"),
                         str(tmp_path / "out"),
                         PipelineConfig(group_size=3))
    assert stats.consensus_written > 0
    assert native._SLOT_LEASES == {}
