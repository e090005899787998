"""``c3poa`` CLI — flag surface of the reference driver (C3POa.py:26-63).

Flags preserved: -r/--reads, -s/--splint_file, -o/--out_path, -c/--config,
-l/--lencutoff, -d/--mdistcutoff, -z/--zero (store_false with default True:
*passing* -z excludes zero-repeat reads, matching the reference's inverted
semantics, C3POa.py:48-49), -n/--numThreads, -g/--groupSize,
-b/--blatThreads, -co/--compress_output, -v/--version.

-c is accepted for compatibility but ignored: there are no external
racon/blat binaries to locate.  -b chunks reads by thread count (one
group per -n worker, the reference's "(faster)" mode,
bin/preprocess.py:81-84) via the same counting pass the reference does.

Extra flag: --backend {auto,tpu,numpy} selects the compute backend
(auto = TPU kernels when a TPU/accelerator is visible, else numpy).
"""

from __future__ import annotations

import argparse
import sys

from . import __version__
from .consensus.engine import ConsensusParams
from .pipeline.run import PipelineConfig, run_pipeline

VERSION = f"v2.2.3+tpu ({__version__})"


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Makes consensus sequences from R2C2 reads (TPU-native).",
        add_help=True, prefix_chars="-")
    parser.add_argument("--reads", "-r", type=str,
                        help="FASTQ file that contains the long R2C2 reads.")
    parser.add_argument("--splint_file", "-s", type=str,
                        help="Path to the splint FASTA file.")
    parser.add_argument("--out_path", "-o", type=str, default=".",
                        help="Directory where all the files will end up.")
    parser.add_argument("--config", "-c", type=str, default="",
                        help="Accepted for compatibility; ignored (no "
                             "external binaries are used).")
    parser.add_argument("--lencutoff", "-l", type=int, default=1000,
                        help="Raw read length cutoff (default 1000).")
    parser.add_argument("--mdistcutoff", "-d", type=int, default=500,
                        help="Median distance cutoff (default 500).")
    parser.add_argument("--zero", "-z", action="store_false", default=True,
                        help="Use to exclude zero repeat reads. Defaults to "
                             "True (includes zero repeats).")
    parser.add_argument("--numThreads", "-n", type=int, default=1,
                        help="Worker threads for the CPU backend.")
    parser.add_argument("--groupSize", "-g", type=int, default=1000,
                        help="Reads per processing group (default 1000).")
    parser.add_argument("--blatThreads", "-b", action="store_true",
                        default=False,
                        help="Chunk reads by thread count instead of "
                             "--groupSize (one group per worker, the "
                             "reference's '(faster)' mode; CPU backend "
                             "with -n > 1).")
    parser.add_argument("--compress_output", "-co", action="store_true",
                        default=False,
                        help="gzip the consensus fasta and subread fastq.")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="Continue an interrupted run from the last "
                             "completed read group (uncompressed output "
                             "only; the reference's PSL-cache role).")
    parser.add_argument("--backend", type=str, default="auto",
                        choices=["auto", "tpu", "numpy"],
                        help="Compute backend (default: auto).")
    parser.add_argument("--mesh_devices", type=str, default="auto",
                        help="Accelerator chips to use in THIS process: "
                             "'auto' (all local chips), '1' (single "
                             "device), or an explicit count.  >1 shards "
                             "every kernel batch over a 1-D data mesh "
                             "via shard_map (single-host multi-chip; "
                             "combine with --num_processes for "
                             "multi-host).")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="Multi-host: coordinator address "
                             "(host:port) for jax.distributed.")
    parser.add_argument("--num_processes", type=int, default=1,
                        help="Multi-host: total number of host processes; "
                             "read groups shard round-robin and host 0 "
                             "merges the per-host trees byte-identically "
                             "to a single-host run.")
    parser.add_argument("--process_id", type=int, default=None,
                        help="Multi-host: this process's index.")
    parser.add_argument("--rss-restart-mb", type=int, default=0,
                        help="Bound process memory: exit cleanly at a "
                             "group checkpoint once RSS exceeds this many "
                             "MB and relaunch with --resume "
                             "(byte-identical).  Counters hosts whose "
                             "accelerator client leaks every "
                             "host->device transfer (tools/leak_probe.py);"
                             " 0 disables.")
    parser.add_argument("--version", "-v", action="version", version=VERSION)

    if argv is None and len(sys.argv) == 1:
        parser.print_help()
        sys.exit(0)
    return parser.parse_args(argv)


def pick_backend(name: str, mesh_devices: str = "1"):
    import os
    if os.environ.get("C3POA_FORCE_CPU") == "1":
        # pin the CPU platform (sitecustomize on some hosts preregisters
        # an accelerator platform before user code, so env vars alone are
        # too late); previously only the multi-process path applied this,
        # leaving single-process "CPU" runs on the accelerator
        import jax
        jax.config.update("jax_platforms", "cpu")
    if name == "numpy":
        from .pipeline.backend import NumpyBackend
        return NumpyBackend()
    if name in ("tpu", "auto"):
        if name == "auto" and os.environ.get("C3POA_FORCE_CPU") != "1":
            # a dead TPU relay makes device init HANG (not error): probe
            # in a subprocess so auto degrades to numpy instead of
            # wedging; explicit --backend tpu skips this and waits
            from .utils.probe import probe_accelerator
            if probe_accelerator() is None:
                print("accelerator probe failed (relay down?); "
                      "using numpy backend", file=sys.stderr)
                from .pipeline.backend import NumpyBackend
                return NumpyBackend()
        try:
            from .pipeline.tpu_backend import TpuBackend
            return TpuBackend(mesh=_local_mesh(mesh_devices))
        except Exception as exc:  # no jax / no device
            if name == "tpu":
                raise
            print(f"TPU backend unavailable ({exc}); using numpy backend",
                  file=sys.stderr)
            from .pipeline.backend import NumpyBackend
            return NumpyBackend()
    raise ValueError(name)


def _local_mesh(mesh_devices: str = "auto"):
    """1-D data mesh over this process's local accelerator devices, or
    None for the plain single-device jit path.  'auto' uses every local
    chip — a v5e-8 host saturates all 8 chips from one process, no
    jax.distributed needed."""
    if mesh_devices in ("off", "0", "1"):
        return None
    import jax

    local = jax.local_devices()
    n = len(local) if mesh_devices == "auto" else int(mesh_devices)
    if n <= 1:
        return None
    if n > len(local):
        raise ValueError(
            f"--mesh_devices {n}: only {len(local)} local devices")
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(local[:n]), ("data",))


def supervise(argv, module="c3poa_tpu.cli"):
    """Relaunch the CLI under a restart loop: the child exits with
    RESTART_EXIT_CODE at a durable group checkpoint when RSS crosses
    --rss-restart-mb; every relaunch continues via --resume
    (byte-identical, progress guaranteed — the child only restarts after
    completing at least one new group)."""
    import os
    import subprocess

    from .utils.mem import RESTART_EXIT_CODE

    cmd = [sys.executable, "-m", module] + list(argv)
    env = dict(os.environ, C3POA_SUPERVISED="1")
    restarts = -1
    while True:
        restarts += 1
        rc = subprocess.call(cmd, env=env)
        if rc != RESTART_EXIT_CODE:
            if restarts:
                print(f"rss supervisor: {restarts} restart(s)",
                      file=sys.stderr)
            return rc
        # the first child launch uses the user's flags verbatim; only
        # RESTARTS imply resume semantics — otherwise a fresh run into an
        # output dir holding an old completed manifest would silently
        # skip all work (ADVICE r3)
        if "--resume" not in cmd:
            cmd.append("--resume")


def main(argv=None):
    import os

    args = parse_args(argv)
    if not args.reads or not args.splint_file:
        print("Reads (--reads/-r) and splint (--splint_file/-s) are required",
              file=sys.stderr)
        sys.exit(1)
    if args.rss_restart_mb:
        from .utils.mem import rss_mb
        if rss_mb() == 0:
            print("--rss-restart-mb: RSS monitoring unavailable on this "
                  "platform (/proc/self/status unreadable); the memory "
                  "bound will never trigger", file=sys.stderr)
            sys.exit(1)
        if args.compress_output or args.num_processes > 1:
            print("--rss-restart-mb needs the resume manifest: not "
                  "supported with -co or --num_processes > 1 (compress "
                  "at the end, or bound each host's run separately)",
                  file=sys.stderr)
            sys.exit(1)
        if os.environ.get("C3POA_SUPERVISED") != "1":
            return supervise(argv if argv is not None else sys.argv[1:])
    process_index, process_count = 0, 1
    if args.num_processes > 1:
        from .parallel.dist import initialize
        process_index, process_count = initialize(
            args.coordinator, args.num_processes, args.process_id)
    group_size = args.groupSize
    if args.blatThreads and args.numThreads > 1:
        # reference -b: chunk = reads // threads (bin/preprocess.py:81-84)
        # — one group per worker; needs the counting pass the reference
        # also does (C3POa.py:201-206)
        from .io.fastx import read_fastx
        n_pass = sum(1 for r in read_fastx(args.reads)
                     if len(r.seq) >= args.lencutoff)
        group_size = max(1, -(-n_pass // args.numThreads))
    cfg = PipelineConfig(
        lencutoff=args.lencutoff,
        mdistcutoff=args.mdistcutoff,
        zero=args.zero,
        group_size=group_size,
        num_threads=args.numThreads,
        compress=args.compress_output,
        resume=args.resume,
        process_index=process_index,
        process_count=process_count,
        rss_restart_mb=args.rss_restart_mb,
        cons=ConsensusParams(),
    )
    # 'auto' meshes all local chips only in single-process runs; under
    # --num_processes, pass an explicit --mesh_devices count to shard
    # each process's groups over its own local chips too
    mesh_devices = args.mesh_devices
    if process_count > 1 and mesh_devices == "auto":
        mesh_devices = "1"
    backend = pick_backend(args.backend, mesh_devices)
    from .utils.mem import RESTART_EXIT_CODE, RssRestartNeeded
    try:
        stats = run_pipeline(args.reads, args.splint_file, args.out_path,
                             cfg, backend)
    except RssRestartNeeded as exc:
        print(f"c3poa: {exc}", file=sys.stderr)
        sys.exit(RESTART_EXIT_CODE)
    except (ValueError, OSError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        sys.exit(1)
    print(f"consensus written: {stats.consensus_written} "
          f"(of {stats.total_reads} length-passing reads; "
          f"{stats.no_splint} no-splint, {stats.short_reads} short)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
