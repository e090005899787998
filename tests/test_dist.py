import os

import numpy as np

from c3poa_tpu.parallel.dist import host_shard_groups, merge_host_outputs


def test_host_shard_groups_round_robin():
    groups = [[i] for i in range(10)]
    got0 = list(host_shard_groups(iter(groups), 0, 3))
    got1 = list(host_shard_groups(iter(groups), 1, 3))
    got2 = list(host_shard_groups(iter(groups), 2, 3))
    assert [g for g, _ in got0] == [0, 3, 6, 9]
    assert [g for g, _ in got1] == [1, 4, 7]
    assert [g for g, _ in got2] == [2, 5, 8]
    all_groups = sorted(got0 + got1 + got2)
    assert [g for g, _ in all_groups] == list(range(10))


def test_merge_host_outputs(tmp_path):
    for h in range(2):
        d = tmp_path / f"host_{h}" / "Splint1"
        os.makedirs(d)
        (d / "R2C2_Consensus.fasta").write_text(f">h{h}\nACGT\n")
        (d / "R2C2_Subreads.fastq").write_text(f"@h{h}_1\nAC\n+\nII\n")
    merge_host_outputs(str(tmp_path), 2, ["Splint1"])
    cons = (tmp_path / "Splint1" / "R2C2_Consensus.fasta").read_text()
    assert cons == ">h0\nACGT\n>h1\nACGT\n"
    subs = (tmp_path / "Splint1" / "R2C2_Subreads.fastq").read_text()
    assert subs.startswith("@h0_1") and "@h1_1" in subs
