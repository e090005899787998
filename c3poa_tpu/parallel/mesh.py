"""Device-mesh data parallelism.

The reference's only parallelism is an embarrassingly-parallel process pool
over read groups with filesystem gathers (C3POa.py:236-272, SURVEY.md §2.3).
The TPU-native equivalent: a 1-D ``data`` mesh; read batches sharded over it,
splint references replicated, per-shard stats all-reduced with psum.
Multi-host extends the same mesh over processes (jax.distributed); batches
stay host-local, collectives ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.banded import banded_align_batch
from ..kernels.locate import locate_device


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def sharded_locate(mesh: Mesh):
    """Jit locate_batch with batch dim sharded over the data mesh and the
    splint reference replicated."""
    batch = NamedSharding(mesh, P("data"))
    batch2 = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    def fn(reads, lens, splints):
        return locate_device(reads, lens, splints)

    return jax.jit(
        fn,
        in_shardings=(batch2, batch, repl),
        out_shardings=(batch, batch, batch2, batch2, batch, batch, batch),
    )


def sharded_step(mesh: Mesh):
    """The full device step (locate + consensus alignment) over a sharded
    batch, plus a psum'd stats vector — the multi-chip execution unit the
    driver dry-runs."""
    batch = NamedSharding(mesh, P("data"))
    batch2 = NamedSharding(mesh, P("data", None))
    batch3 = NamedSharding(mesh, P("data", None, None))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def stats_allreduce(n_peaks, scores):
        # cross-shard reduction: total peaks and mean align score
        return jnp.sum(n_peaks), jnp.mean(scores)

    def fn(reads, lens, splints, queries, targets, ql, tl):
        combo, score, cand_pos, cand_h, _med, _deep, _marg = locate_device(
            reads, lens, splints)
        n_cand = jnp.sum(cand_pos >= 0, axis=1).astype(jnp.int32)
        a_score, j_end, moves = banded_align_batch(queries, targets, ql, tl,
                                                   band=64)
        total_peaks, mean_score = stats_allreduce(n_cand, a_score)
        return (combo, score, cand_pos, n_cand, a_score, j_end, moves,
                total_peaks, mean_score)

    return jax.jit(
        fn,
        in_shardings=(batch2, batch, repl, batch2, batch2, batch, batch),
        out_shardings=(batch, batch, batch2, batch, batch, batch, batch3,
                       repl, repl),
    )
