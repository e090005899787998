import os

import numpy as np
import pytest

from c3poa_tpu import sim
from c3poa_tpu.io.fastx import read_fastx
from c3poa_tpu.pipeline.backend import NumpyBackend
from c3poa_tpu.pipeline.postprocess import (
    PostprocessConfig, match_index, run_postprocess,
)
from c3poa_tpu.ref.lev import levenshtein, sliding_min_distance
from c3poa_tpu.utils.seqs import revcomp


def test_levenshtein_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(30):
        a = sim.random_seq(rng, int(rng.integers(1, 15)))
        b = sim.random_seq(rng, int(rng.integers(1, 15)))
        # simple quadratic reference
        la, lb = len(a), len(b)
        dp = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            dp[i][0] = i
        for j in range(lb + 1):
            dp[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                               dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        assert levenshtein(a, b) == dp[la][lb]


def test_sliding_min_distance():
    rng = np.random.default_rng(1)
    idx = "ACGTACGTTA"
    seq = sim.random_seq(rng, 5) + idx + sim.random_seq(rng, 5)
    assert sliding_min_distance(seq, idx) == 0
    mutated = seq[:7] + "A" + seq[8:]
    assert sliding_min_distance(mutated, idx) <= 1


def test_match_index_accept_and_margin():
    indexes = {f"Index{i}": sim.random_seq(np.random.default_rng(i), 10)
               for i in range(1, 5)}
    seq_to_idx = {v: k for k, v in indexes.items()}
    win = "AGT" + indexes["Index2"] + "TTCCAADb"[:7]
    win = "AGT" + indexes["Index2"] + "TTCCAAic"[:7].replace("i", "A").replace("c", "C")
    assert match_index(win, seq_to_idx) == "Index2"
    # random window: no match
    assert match_index(sim.random_seq(np.random.default_rng(99), 20),
                       seq_to_idx) in list(indexes) + ["-"]


@pytest.fixture(scope="module")
def post_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("post")
    rng = np.random.default_rng(42)
    indexes = {f"Index{i}": sim.random_seq(np.random.default_rng(1000 + i), 10)
               for i in range(1, 5)}
    reads, expected = [], {}
    for i in range(10):
        direction = "+" if i % 2 == 0 else "-"
        idx = f"Index{(i % 4) + 1}"
        name, seq, cdna = sim.make_consensus_like(
            rng, f"cons_{i}", cdna_len=600, index=indexes[idx],
            direction=direction, error=0.0)
        reads.append((name, seq))
        expected[name] = (direction, idx, cdna)
    # cons_1 carries a chance 11-base adapter match in its random cDNA —
    # a genuine second PSL-row under BLAT's matches>10 accounting, so the
    # exactly-one-hit rule rejects it (reference C3POa_postprocessing.py:323)
    del expected["cons_1"]
    # one junk read with no adapters
    reads.append(("junk", sim.random_seq(rng, 800)))

    with open(d / "cons.fasta", "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(d / "adapters.fasta"), dict(sim.DEFAULT_ADAPTERS))
    sim.write_fasta(str(d / "indexes.fasta"), indexes)
    out = str(d / "out")
    stats = run_postprocess(str(d / "cons.fasta"), out,
                            str(d / "adapters.fasta"),
                            str(d / "indexes.fasta"),
                            PostprocessConfig(trim=True))
    return d, reads, expected, indexes, out, stats


def test_postprocess_stats(post_run):
    _, reads, expected, indexes, out, stats = post_run
    assert stats.total == 11
    assert stats.written == 9      # cons_1 rejected: chance second hit
    assert stats.no_adapter == 2   # junk + cons_1


def test_postprocess_demux_and_orientation(post_run):
    d, reads, expected, indexes, out, stats = post_run
    found = {}
    for idx_name in list(indexes) + ["no_index_found"]:
        path = os.path.join(out, idx_name,
                            "R2C2_full_length_consensus_reads.fasta")
        if not os.path.exists(path):
            continue
        for rec in read_fastx(path):
            base, ln = rec.name.rsplit("_", 1)
            found[base] = (idx_name, rec.seq, int(ln))
    assert len(found) == 9
    for name, (direction, idx, cdna) in expected.items():
        got_idx, got_seq, ln = found[name]
        assert got_idx == idx, f"{name}: routed to {got_idx}, want {idx}"
        # trimmed + reoriented: must contain the cDNA 5'->3'
        assert cdna in got_seq, f"{name}: cDNA not in trimmed output"
        assert ln == len(got_seq)


def test_postprocess_mux_tsv(post_run):
    _, reads, expected, indexes, out, stats = post_run
    lines = open(os.path.join(out, "R2C2_oligodT_multiplexing.tsv")) \
        .read().splitlines()
    assert len(lines) == 9
    for line in lines:
        name, rev_win, fwd_win = line.split("\t")
        assert len(rev_win) == 20 and len(fwd_win) == 20


def test_postprocess_no_index_untrimmed(tmp_path):
    rng = np.random.default_rng(7)
    name, seq, cdna = sim.make_consensus_like(rng, "c0", direction="+",
                                              error=0.0)
    with open(tmp_path / "cons.fasta", "w") as fh:
        fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(tmp_path / "adapters.fasta"),
                    dict(sim.DEFAULT_ADAPTERS))
    out = str(tmp_path / "out")
    stats = run_postprocess(str(tmp_path / "cons.fasta"), out,
                            str(tmp_path / "adapters.fasta"), None,
                            PostprocessConfig(trim=False))
    assert stats.written == 1
    recs = list(read_fastx(
        os.path.join(out, "R2C2_full_length_consensus_reads.fasta")))
    # untrimmed: +-40bp padding around the adapter span
    assert cdna in recs[0].seq
    left = list(read_fastx(os.path.join(
        out, "R2C2_full_length_consensus_reads_left_splint.fasta")))
    right = list(read_fastx(os.path.join(
        out, "R2C2_full_length_consensus_reads_right_splint.fasta")))
    assert len(left) == 1 and len(right) == 1


def test_adapter_hits_backend_parity(post_run):
    d, reads, expected, indexes, out, stats = post_run
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    from c3poa_tpu.utils.seqs import encode, revcomp_encoded
    from c3poa_tpu.utils import encode as enc2

    combo_codes, combo_lens = [], []
    for name, seq in sim.DEFAULT_ADAPTERS.items():
        c = encode(seq)
        combo_codes += [c, revcomp_encoded(c)]
        combo_lens += [len(seq), len(seq)]
    enc_reads = [encode(seq) for _, seq in reads[:6]]
    a = NumpyBackend().adapter_hits(enc_reads, combo_codes, combo_lens)
    b = TpuBackend().adapter_hits(enc_reads, combo_codes, combo_lens)
    for k, nm in enumerate(["s1", "j1", "qe1", "ts1", "qs1", "s2"]):
        np.testing.assert_array_equal(a[k], b[k], err_msg=nm)


def test_adapter_dimer_rejected_single_copy_accepted():
    """A tandem adapter dimer must surface a second hit (read rejected by
    the exactly-one rule, matching BLAT's every-PSL-row accounting); a
    single copy plus the 5' adapter's shifted self-similarity must not."""
    from c3poa_tpu.pipeline.backend import NumpyBackend
    from c3poa_tpu.utils.seqs import encode, revcomp, revcomp_encoded

    # (seed 9 plants a chance 13-base adapter match in the random tail —
    # which correctly counts as a second hit, as BLAT's matches>10 would)
    rng = np.random.default_rng(10)
    a5 = sim.DEFAULT_ADAPTERS["5Prime_adapter"]
    a3 = sim.DEFAULT_ADAPTERS["3Prime_adapter"]
    combo_codes = [encode(a5), revcomp_encoded(encode(a5))]
    combo_lens = [len(a5), len(a5)]

    flank = sim.random_seq(rng, 300)
    tail = sim.random_seq(rng, 300)
    single = flank + a5 + tail
    dimer = flank + a5 + sim.random_seq(rng, 5) + a5 + tail

    b = NumpyBackend()
    res_s = b.adapter_hits([encode(single)], combo_codes, combo_lens)
    res_d = b.adapter_hits([encode(dimer)], combo_codes, combo_lens)
    s1_s, s2_s = int(res_s[0][0, 0]), int(res_s[5][0, 0])
    s1_d, s2_d = int(res_d[0][0, 0]), int(res_d[5][0, 0])
    assert s1_s == len(a5) and s2_s <= 10   # self-similarity suppressed
    assert s1_d == len(a5) and s2_d > 10    # genuine second copy surfaces

    # parity: the device kernel reports the same second hits
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend
    res_t = TpuBackend().adapter_hits(
        [encode(single), encode(dimer)], combo_codes, combo_lens)
    assert int(res_t[5][0, 0]) == s2_s
    assert int(res_t[5][1, 0]) == s2_d


def _make_post_inputs(d, n_reads=25, seed=21):
    rng = np.random.default_rng(seed)
    indexes = {f"Index{i}": sim.random_seq(np.random.default_rng(300 + i), 10)
               for i in range(1, 5)}
    with open(d / "cons.fasta", "w") as fh:
        for i in range(n_reads):
            name, seq, _ = sim.make_consensus_like(
                rng, f"c_{i}", cdna_len=400,
                index=indexes[f"Index{(i % 4) + 1}"],
                direction="+" if i % 2 == 0 else "-", error=0.01)
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(d / "adapters.fasta"), dict(sim.DEFAULT_ADAPTERS))
    sim.write_fasta(str(d / "indexes.fasta"), indexes)


def _tree_bytes(out):
    tree = {}
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.startswith("."):
                continue
            p = os.path.join(root, f)
            tree[os.path.relpath(p, out)] = open(p, "rb").read()
    return tree


def test_postprocess_mp_matches_serial(tmp_path):
    """-n 4 (whole groups over spawn workers) is byte-identical to -n 1."""
    _make_post_inputs(tmp_path)
    out1, out4 = str(tmp_path / "o1"), str(tmp_path / "o4")
    s1 = run_postprocess(str(tmp_path / "cons.fasta"), out1,
                         str(tmp_path / "adapters.fasta"),
                         str(tmp_path / "indexes.fasta"),
                         PostprocessConfig(trim=True, group_size=7))
    s4 = run_postprocess(str(tmp_path / "cons.fasta"), out4,
                         str(tmp_path / "adapters.fasta"),
                         str(tmp_path / "indexes.fasta"),
                         PostprocessConfig(trim=True, group_size=7,
                                           threads=4))
    assert s1 == s4
    assert _tree_bytes(out1) == _tree_bytes(out4)


def test_postprocess_resume(tmp_path):
    """Interrupt after 2 groups; --resume completes byte-identically."""
    from c3poa_tpu.pipeline import postprocess as pp

    _make_post_inputs(tmp_path)
    args = (str(tmp_path / "cons.fasta"),)
    kw = dict(adapter_fasta=str(tmp_path / "adapters.fasta"),
              index_fasta=str(tmp_path / "indexes.fasta"))

    full = str(tmp_path / "full")
    run_postprocess(*args, out_path=full,
                    cfg=PostprocessConfig(trim=True, group_size=7), **kw)

    part = str(tmp_path / "part")
    calls = 0
    orig = pp._process_group

    def bomb(*a, **k):
        nonlocal calls
        calls += 1
        if calls > 2:
            raise RuntimeError("simulated crash")
        return orig(*a, **k)

    pp._process_group = bomb
    try:
        with pytest.raises(RuntimeError):
            run_postprocess(*args, out_path=part,
                            cfg=PostprocessConfig(trim=True, group_size=7),
                            **kw)
    finally:
        pp._process_group = orig

    stats = run_postprocess(*args, out_path=part,
                            cfg=PostprocessConfig(trim=True, group_size=7,
                                                  resume=True), **kw)
    t_full, t_part = _tree_bytes(full), _tree_bytes(part)
    t_part = {k: v for k, v in t_part.items()}
    assert t_full == t_part
    assert stats.total == 25


def test_postprocess_barcoded_10x(tmp_path):
    """-b writes the 10X barcode file with the reference's literal
    plus/minus suffix on the sequence line (C3POa_postprocessing.py:374-384)."""
    rng = np.random.default_rng(32)
    recs = []
    for i, direction in enumerate("+-"):
        name, seq, _ = sim.make_consensus_like(
            rng, f"bc_{i}", cdna_len=400, direction=direction, error=0.0)
        recs.append((name, seq))
    with open(tmp_path / "cons.fasta", "w") as fh:
        for name, seq in recs:
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(tmp_path / "adapters.fasta"),
                    dict(sim.DEFAULT_ADAPTERS))
    out = str(tmp_path / "out")
    stats = run_postprocess(str(tmp_path / "cons.fasta"), out,
                            str(tmp_path / "adapters.fasta"), None,
                            PostprocessConfig(trim=True, barcoded=True))
    assert stats.written == 2
    tenx = list(read_fastx(os.path.join(
        out, "R2C2_full_length_consensus_reads_10X_sequences.fasta")))
    assert len(tenx) == 2
    assert any(r.seq.endswith("plus") for r in tenx)
    assert any(r.seq.endswith("minus") for r in tenx)
    for r in tenx:
        body = r.seq.replace("plus", "").replace("minus", "")
        assert len(body) == 40


def test_postprocess_undirectional(tmp_path):
    """-u: one adapter named 'Adapter' on both ends; direction forced '+'
    (C3POa_postprocessing.py:328-330)."""
    rng = np.random.default_rng(33)
    a = sim.random_seq(rng, 30)
    cdna = sim.random_seq(rng, 500)
    seq = (sim.random_seq(rng, 60) + a + cdna +
           revcomp(a) + sim.random_seq(rng, 60))
    with open(tmp_path / "cons.fasta", "w") as fh:
        fh.write(f">u0\n{seq}\n")
    sim.write_fasta(str(tmp_path / "adapters.fasta"), {"Adapter": a})
    out = str(tmp_path / "out")
    stats = run_postprocess(str(tmp_path / "cons.fasta"), out,
                            str(tmp_path / "adapters.fasta"), None,
                            PostprocessConfig(trim=True, undirectional=True))
    assert stats.written == 1
    recs = list(read_fastx(os.path.join(
        out, "R2C2_full_length_consensus_reads.fasta")))
    assert cdna in recs[0].seq  # '+' orientation kept

def test_postprocess_compress_output(tmp_path):
    """--compress gzips every fasta output (reference
    C3POa_postprocessing.py --compress role); contents match the plain
    run and the tsv stays uncompressed."""
    import gzip

    rng = np.random.default_rng(5)
    indexes = {f"Index{i}": sim.random_seq(np.random.default_rng(500 + i), 10)
               for i in range(1, 3)}
    reads = []
    for i in range(4):
        name, seq, _ = sim.make_consensus_like(
            rng, f"c{i}", cdna_len=400, index=indexes[f"Index{(i % 2) + 1}"],
            direction="+", error=0.0)
        reads.append((name, seq))
    with open(tmp_path / "cons.fasta", "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")
    sim.write_fasta(str(tmp_path / "a.fasta"), dict(sim.DEFAULT_ADAPTERS))
    sim.write_fasta(str(tmp_path / "i.fasta"), indexes)

    out_plain = str(tmp_path / "plain")
    out_gz = str(tmp_path / "gz")
    run_postprocess(str(tmp_path / "cons.fasta"), out_plain,
                    str(tmp_path / "a.fasta"), str(tmp_path / "i.fasta"),
                    PostprocessConfig(trim=True))
    run_postprocess(str(tmp_path / "cons.fasta"), out_gz,
                    str(tmp_path / "a.fasta"), str(tmp_path / "i.fasta"),
                    PostprocessConfig(trim=True, compress=True))

    n_checked = 0
    for root, _dirs, files in os.walk(out_plain):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), out_plain)
            if f.startswith("."):
                continue  # resume manifest — uncompressed runs only
            if f.endswith(".tsv"):
                assert os.path.exists(os.path.join(out_gz, rel))
                continue
            plain_txt = open(os.path.join(out_plain, rel)).read()
            with gzip.open(os.path.join(out_gz, rel + ".gz"), "rt") as fh:
                assert fh.read() == plain_txt
            assert not os.path.exists(os.path.join(out_gz, rel))
            n_checked += 1
    assert n_checked >= 3


def test_postprocess_mesh_matches_serial(tmp_path):
    """TpuBackend(mesh=8-device) adapter scan is byte-identical to the
    numpy postprocess run (--mesh_devices on the postprocess CLI)."""
    from c3poa_tpu.cli import _local_mesh
    from c3poa_tpu.pipeline.tpu_backend import TpuBackend

    _make_post_inputs(tmp_path)
    out_n, out_m = str(tmp_path / "on"), str(tmp_path / "om")
    sn = run_postprocess(str(tmp_path / "cons.fasta"), out_n,
                         str(tmp_path / "adapters.fasta"),
                         str(tmp_path / "indexes.fasta"),
                         PostprocessConfig(trim=True, group_size=7))
    sm = run_postprocess(str(tmp_path / "cons.fasta"), out_m,
                         str(tmp_path / "adapters.fasta"),
                         str(tmp_path / "indexes.fasta"),
                         PostprocessConfig(trim=True, group_size=7),
                         backend=TpuBackend(mesh=_local_mesh("auto")))
    assert sn == sm
    assert _tree_bytes(out_n) == _tree_bytes(out_m)
