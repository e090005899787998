"""Process-memory helpers for the RSS-bounded restart supervisor.

Why this exists: this box's relayed TPU runtime permanently leaks a
host-side copy of EVERY host->device transfer (~100% of uploaded bytes;
reproduce with ``python tools/leak_probe.py``).  Framework memory is
bounded — the numpy backend runs flat, live jax arrays stay <=12 MB,
Python object counts are constant — so a long streaming run's RSS grows
linearly with input volume through no fault of its own.  The pipelines
bound it by exiting cleanly at a group checkpoint once RSS crosses a
limit and letting a supervisor relaunch with ``--resume``
(byte-identical continuation, same machinery the SIGKILL chaos test
exercises).
"""

from __future__ import annotations

# EX_TEMPFAIL: the supervisor relaunches on exactly this exit code
RESTART_EXIT_CODE = 75


class RssRestartNeeded(RuntimeError):
    """Raised at a durable group checkpoint when VmRSS exceeds the
    configured limit; the CLI converts it into RESTART_EXIT_CODE."""


def rss_mb() -> int:
    """Current VmRSS in MB (0 if /proc is unavailable)."""
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return 0
