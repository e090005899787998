"""Multi-host distribution.

The reference is single-host only (SURVEY.md §2.3); its "cluster" is a
process pool.  Here, multi-host runs use the standard JAX recipe:

- ``initialize()`` -> jax.distributed (one process per host; chips ride
  ICI inside a host, only control/stats cross DCN);
- input sharding is by *read group round-robin*: host h processes groups
  g with g % num_hosts == h, streaming the same fastq from its own offset
  (no scatter step; the input and output paths must be shared across
  hosts, as they are on pod slices with a common filesystem);
- each host writes its own per-splint output tree under
  ``out/host_<h>/`` and records per-group byte offsets in its progress
  manifest; ``merge_host_outputs`` interleaves those byte spans by global
  group index, reproducing the single-host byte layout exactly;
- stats are summed with a device-sharded reduction: every host
  contributes its counters on its first local device and a jitted global
  sum replicates the totals (``allreduce_stats``) — this also acts as
  the completion barrier before host 0 merges.

Tested with N-process CPU runs (tests/test_dist.py): the merged
multi-process output is byte-identical to the single-process run.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np

# per-host progress/span manifest name (same file the resume path uses)
from ..pipeline.run import MANIFEST


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed.initialize when multi-process; returns
    (process_index, process_count).

    ``C3POA_FORCE_CPU=1`` pins the CPU platform first (needed on hosts
    whose sitecustomize preregisters an accelerator platform; env vars
    alone are too late once jax is imported).
    """
    import jax

    if os.environ.get("C3POA_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
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
    """Sum integer counters across hosts.

    Each process contributes its counters on its *first local device* row
    of a device-sharded (num_devices, K) array (rows for its other local
    devices are zero), built with ``make_array_from_process_local_data``;
    a jitted global sum with replicated output yields identical totals on
    every host.  Unlike a psum of "replicated" per-process-different
    values (invalid: replicated arrays must be globally consistent), this
    is well-defined multi-process JAX.
    """
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return dict(values)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    keys = sorted(values)
    local = np.zeros((jax.local_device_count(), len(keys)), dtype=np.int64)
    local[0] = [int(values[k]) for k in keys]
    mesh = Mesh(np.array(jax.devices()), ("d",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local,
        (jax.device_count(), len(keys)))
    summed = jax.jit(lambda x: jnp.sum(x, axis=0),
                     out_shardings=NamedSharding(mesh, P()))(arr)
    out = np.asarray(summed)
    return {k: int(v) for k, v in zip(keys, out)}


def _host_spans(host_dir: str, manifest: str = MANIFEST
                ) -> list[tuple[int, str, int, int]]:
    """Per-group byte spans for one host: [(gi, relfile, start, end)].

    Reconstructed by diffing the cumulative per-file sizes recorded in
    the host's progress manifest after each group.  ``manifest`` selects
    which progress file to read (the consensus pipeline's and the
    postprocessor's manifests share the span_groups schema)."""
    path = os.path.join(host_dir, manifest)
    if not os.path.exists(path):
        return []
    m = json.load(open(path))
    events: list = []
    prev: dict = {}
    for entry in m.get("span_groups", []):
        gi = entry["gi"]
        for rel, sz in entry["sizes"].items():
            p = prev.get(rel, 0)
            if sz > p:
                events.append((gi, rel, p, sz))
            prev[rel] = sz
    return events


def merge_host_outputs(out_path: str, process_count: int,
                       splints: list[str] | None = None,
                       compress: bool = False,
                       manifest: str = MANIFEST) -> None:
    """Merge per-host output trees (out/host_<h>/...) into the single-host
    layout, interleaving per-group byte spans by global group index — the
    merged files are byte-identical to a single-host run.  ``compress``
    gzips the merged outputs (host trees are always written plain).
    ``manifest`` selects the span manifest (consensus pipeline vs
    postprocessor)."""
    import gzip

    del splints  # discovered from the span manifests
    events: list = []  # (gi, host, rel, start, end)
    for h in range(process_count):
        host_dir = os.path.join(out_path, f"host_{h}")
        for gi, rel, start, end in _host_spans(host_dir, manifest):
            events.append((gi, h, rel, start, end))
    events.sort(key=lambda e: e[0])

    handles: dict = {}
    try:
        for gi, h, rel, start, end in events:
            if rel not in handles:
                dst = os.path.join(out_path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                if compress and not rel.endswith(".tsv"):
                    # .tsv stays plain, matching _Writers._open
                    handles[rel] = gzip.open(dst + ".gz", "wb")
                else:
                    handles[rel] = open(dst, "wb")
            src = os.path.join(out_path, f"host_{h}", rel)
            with open(src, "rb") as fh:
                fh.seek(start)
                handles[rel].write(fh.read(end - start))
    finally:
        for fh in handles.values():
            fh.close()
