#!/usr/bin/env python3
"""Adversarial accuracy envelope: engine vs the exact POA oracle.

Probes where the production engine (align-to-medoid + vote,
consensus/engine.py) falls behind the abPOA-class algorithm it replaced
(ref/poa.py), in the hostile regimes VERDICT r3 item 4 calls out:

- err10 / err15: 10% / 15% uniform read error
- trunc: copy-length variance — each copy truncated to U(0.65, 1.0) of
  the insert, from a random end
- chimera: 25% of copies carry a junk tail (35% of insert length)
- misq: miscalibrated qualities — errors land on low-q bases but the
  REPORTED quality is inverted (confidently wrong), poisoning
  quality-aware merges

Prints engine/oracle errors + QV per (regime, copies) and the engine's
divergence signals (mean aligned fraction, vote agreement) so a routing
detector can be calibrated.

Usage: python tools/adversarial_sweep.py [n_molecules=16] [insert_len=1000]
"""

import math
import sys

import numpy as np

sys.path.insert(0, ".")

from c3poa_tpu import sim  # noqa: E402
from c3poa_tpu.consensus.engine import (  # noqa: E402
    ConsensusParams, consensus_read,
)
from c3poa_tpu.ref.lev import levenshtein  # noqa: E402
from c3poa_tpu.ref.poa import poa_consensus  # noqa: E402
from c3poa_tpu.utils.seqs import decode, encode  # noqa: E402


def make_copies(rng, insert, copies, regime):
    err = {"clean": 0.06, "err10": 0.10, "err15": 0.15}.get(regime, 0.06)
    sub, ins, dele = err * 0.5, err * 0.25, err * 0.25
    out = []
    for ci in range(copies):
        src = insert
        if regime == "trunc":
            frac = rng.uniform(0.65, 1.0)
            n = int(len(insert) * frac)
            src = insert[:n] if rng.random() < 0.5 else insert[-n:]
        if regime == "misq":
            s, q = sim.mutate_with_quals(rng, src, sub, ins, dele)
            q = (42 - q).astype(np.int8)  # confidently wrong
        else:
            s = sim.mutate(rng, src, sub, ins, dele)
            q = np.clip(rng.normal(20, 4, size=len(s)), 2,
                        40).astype(np.int8)
        s = encode(s)
        if regime == "chimera" and ci % 4 == 3:
            junk = encode(sim.random_seq(rng, int(len(insert) * 0.35)))
            s = np.concatenate([s, junk])
            q = np.concatenate(
                [q, np.full(len(junk), 20, dtype=np.int8)])
        out.append((s, q))
    return out


def qv(errors, bases):
    if errors == 0:
        return 99.0
    return -10.0 * math.log10(errors / bases)


def signals(subs, p):
    """Engine-side divergence signals for one read: (aligned fraction of
    each voter's query, vote disagreement) — cheap byproducts of the
    align+vote the engine already runs."""
    from c3poa_tpu.consensus.engine import pick_draft, serial_align_many
    seqs = [s for s, _ in subs]
    di = pick_draft(seqs)
    draft = np.asarray(seqs[di], dtype=np.int8)
    pairs = [(seqs[i], subs[i][1], draft) for i in range(len(seqs))
             if i != di]
    if not pairs:
        return 1.0
    alns = serial_align_many(pairs, p)
    fracs = []
    for a in alns:
        span = max(a.rec.j_end - a.rec.j_start, 0)
        fracs.append(min(span, len(a.query)) / max(len(a.query), 1))
    return float(np.mean(fracs))


def main(n_mol=16, insert_len=1000, seed=11):
    from c3poa_tpu.utils import prof
    p = ConsensusParams()                       # routing detector ON
    p_off = ConsensusParams(poa_fallback=0.0)   # raw vote engine
    print(f"{'regime':>8} {'copies':>6} {'eng_err':>8} {'raw_err':>8} "
          f"{'ora_err':>8} {'bases':>7} {'engQV':>6} {'rawQV':>6} "
          f"{'oraQV':>6} {'routed':>6} {'alnfrac':>7}")
    for regime in ("clean", "err10", "err15", "trunc", "chimera", "misq"):
        for copies in (3, 5, 8):
            rng = np.random.default_rng(seed)
            e_eng = e_raw = e_ora = bases = 0
            fr = []
            prof.reset()
            for _ in range(n_mol):
                insert = sim.random_seq(rng, insert_len)
                subs = make_copies(rng, insert, copies, regime)
                seqs = [s for s, _ in subs]
                qs = [q for _, q in subs]
                cons, _ = consensus_read(seqs, qs, [], [], p)
                raw, _ = consensus_read(seqs, qs, [], [], p_off)
                ora, _ = poa_consensus(seqs, qs)
                e_eng += levenshtein(decode(cons), insert)
                e_raw += levenshtein(decode(raw), insert)
                e_ora += levenshtein(decode(ora), insert)
                bases += insert_len
                fr.append(signals(subs, p))
            routed = prof.current.counts.get("poa_fallback_reads", 0)
            print(f"{regime:>8} {copies:>6} {e_eng:>8} {e_raw:>8} "
                  f"{e_ora:>8} {bases:>7} {qv(e_eng, bases):>6.1f} "
                  f"{qv(e_raw, bases):>6.1f} {qv(e_ora, bases):>6.1f} "
                  f"{routed:>6} {np.mean(fr):>7.3f}",
                  flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    il = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    main(n, il)
