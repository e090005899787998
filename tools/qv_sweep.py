#!/usr/bin/env python3
"""Consensus accuracy sweep: QV vs copy number, pairwise merge on/off.

Reproduces the BENCHMARKS.md accuracy table and measures the effect of the
reference's 2-row gap-run quality merge (consensus/pairwise.py) on the
low-copy regime (VERDICT.md next-round item 6).

Usage: python tools/qv_sweep.py [n_molecules] [insert_len]
"""

import math
import sys

import numpy as np

sys.path.insert(0, ".")

from c3poa_tpu import sim  # noqa: E402
from c3poa_tpu.consensus.engine import (  # noqa: E402
    ConsensusParams, consensus_read, zero_repeat_consensus,
)
from c3poa_tpu.ref.lev import levenshtein  # noqa: E402
from c3poa_tpu.utils.seqs import decode, encode, phred_to_array  # noqa: E402


def subreads_for(rng, insert, copies, error, correlated=False):
    sub, ins, dele = error * 0.5, error * 0.25, error * 0.25
    out = []
    for _ in range(copies):
        if correlated:
            s, q = sim.mutate_with_quals(rng, insert, sub, ins, dele)
        else:
            s = sim.mutate(rng, insert, sub, ins, dele)
            q = np.clip(rng.normal(20, 4, size=len(s)), 2, 40).astype(np.int8)
        out.append((encode(s), q))
    return out


def qv(errors, bases):
    if errors == 0:
        return 99.0
    return -10.0 * math.log10(errors / bases)


def sweep(n_mol=8, insert_len=1000, error=0.06, seed=7, correlated=False):
    if correlated:
        print("# quality-CORRELATED error channel (sim.mutate_with_quals):"
              "\n# errors land on low-quality bases, so quality-aware"
              " merges have real signal")
    print(f"{'copies':>7} {'mode':>9} {'errors':>7} {'bases':>7} {'QV':>6}")
    for copies in (2, 3, 5, 8):
        for pairwise in (False, True):
            rng = np.random.default_rng(seed)
            p = ConsensusParams(pairwise=pairwise)
            errs = bases = 0
            for _ in range(n_mol):
                insert = sim.random_seq(rng, insert_len)
                subs = subreads_for(rng, insert, copies, error, correlated)
                cons, _ = consensus_read(
                    [s for s, _ in subs], [q for _, q in subs], [], [], p)
                errs += levenshtein(decode(cons), insert)
                bases += insert_len
            print(f"{copies:>7} {'pairwise' if pairwise else 'vote':>9} "
                  f"{errs:>7} {bases:>7} {qv(errs, bases):>6.1f}")
    # zero-repeat splice: two ~60% fragments of the insert
    for pairwise in (False, True):
        rng = np.random.default_rng(seed)
        p = ConsensusParams(pairwise=pairwise)
        errs = bases = 0
        for _ in range(n_mol):
            insert = sim.random_seq(rng, insert_len)
            cut = int(insert_len * 0.6)
            e3 = (error * 0.5, error * 0.25, error * 0.25)
            if correlated:
                tail, q0 = sim.mutate_with_quals(rng, insert[-cut:], *e3)
                head, q1 = sim.mutate_with_quals(rng, insert[:cut], *e3)
                s0, s1 = encode(tail), encode(head)
            else:
                tail = sim.mutate(rng, insert[-cut:], *e3)
                head = sim.mutate(rng, insert[:cut], *e3)
                # raw read = [tail][splint][head]; fragment 0 = 5' part
                s0, s1 = encode(tail), encode(head)
                q0 = np.clip(rng.normal(20, 4, size=len(s0)), 2,
                             40).astype(np.int8)
                q1 = np.clip(rng.normal(20, 4, size=len(s1)), 2,
                             40).astype(np.int8)
            cons, _ = zero_repeat_consensus(s0, q0, s1, q1, p)
            if len(cons):
                errs += levenshtein(decode(cons), insert)
                bases += insert_len
        print(f"{'0(splice)':>7} {'pairwise' if pairwise else 'vote':>9} "
              f"{errs:>7} {bases:>7} {qv(errs, max(bases, 1)):>6.1f}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--correlated"]
    n = int(args[0]) if len(args) > 0 else 8
    il = int(args[1]) if len(args) > 1 else 1000
    sweep(n, il, correlated="--correlated" in sys.argv)
