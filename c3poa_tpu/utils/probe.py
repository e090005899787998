"""Accelerator liveness probe.

On hosts that reach their TPU through a relay, a dead relay makes jax
device init HANG instead of erroring, which would wedge any pipeline
started with --backend auto.  Probing in a subprocess under a timeout
(import + devices + one materialized computation) turns "relay down"
into a recoverable signal: auto falls back to the numpy backend, an
explicit --backend tpu still waits on the real init.
"""

from __future__ import annotations

import os
import subprocess
import sys


def probe_accelerator(timeout: float | None = None) -> str | None:
    """Return the live jax platform name ('tpu', 'cpu', ...) or None if
    device init fails or times out.  C3POA_PROBE_TIMEOUT overrides the
    timeout (seconds); C3POA_SKIP_PROBE=1 skips probing entirely (treat
    as live — e.g. when a warm process already holds the device)."""
    if os.environ.get("C3POA_SKIP_PROBE") == "1":
        return "skipped"
    timeout = float(os.environ.get("C3POA_PROBE_TIMEOUT", timeout or 90.0))
    # some hosts' sitecustomize imports jax and pins an accelerator
    # platform before user code, ignoring the env — re-apply
    # JAX_PLATFORMS via jax.config so the env stays authoritative here
    code = ("import os, jax\n"
            "p = os.environ.get('JAX_PLATFORMS')\n"
            "if p: jax.config.update('jax_platforms', p)\n"
            "d = jax.devices()\n"
            "jax.numpy.ones(8).sum().item()\n"
            "print('PLATFORM=' + d[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout, text=True)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode == 0 and "PLATFORM=" in r.stdout:
        return r.stdout.rsplit("PLATFORM=", 1)[1].strip()
    return None
