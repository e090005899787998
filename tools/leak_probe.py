#!/usr/bin/env python3
"""Minimal reproducer for the accelerator-client transfer leak.

Findings on this box (2026-08, jax 0.9.0 + axon relay), from the 1M-read
soak's linearly-growing RSS (SOAK.json) bisected down to one line:

- EVERY host->device transfer permanently leaks ~100% of the uploaded
  bytes in the relay client (`jnp.asarray`, `jax.device_put`,
  `client.buffer_from_pyval`, dlpack import — all paths; explicit
  `.delete()` and host-buffer reuse do not help).
- Device-born arrays + downloads (`np.asarray(device_arr)`) are CLEAN.
- Genuine XLA:CPU (jax.config jax_platforms=cpu — the env var alone is
  overridden by the preregistered relay plugin) is ~flat: the leak is in
  the relay client, not jax itself, and NOT in this framework (numpy
  backend runs flat, live jax arrays stay bounded, Python object counts
  are constant — measured in the same bisection).

Consequence: long streaming runs grow RSS by about the input volume
(~64 KB/read at bench shapes).  Mitigation shipped: the CLIs'
``--rss-restart-mb`` supervisor (clean checkpoint exit + --resume,
byte-identical).  Run this probe on future toolchains; if "upload"
stops leaking, the supervisor can default off.

    python tools/leak_probe.py [upload|device_compute|pipeline] [iters]
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def rss_mb() -> int:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return 0


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "upload"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    import jax
    import jax.numpy as jnp

    mb_per_iter = 4.0  # (128, 32768) int8
    rng = np.random.default_rng(0)
    if which == "upload":
        # warm the client, then measure pure uploads
        jnp.zeros(8).block_until_ready()
        base = rss_mb()
        for i in range(iters):
            R = rng.integers(0, 4, (128, 32768)).astype(np.int8)
            x = jnp.asarray(R)
            x.block_until_ready()
            del x, R
        grown = rss_mb() - base
    elif which == "device_compute":
        key = jax.random.PRNGKey(0)
        f = jax.jit(
            lambda k: jax.random.randint(k, (128, 32768), 0, 4, jnp.int32))
        _ = np.asarray(f(key))
        base = rss_mb()
        for _i in range(iters):
            key, sk = jax.random.split(key)
            _ = np.asarray(f(sk))
        grown = rss_mb() - base
    elif which == "pipeline":
        # end-to-end: RSS after each group through the real pipeline
        import os
        import tempfile

        from bench import make_dataset, run_once
        from c3poa_tpu.pipeline.tpu_backend import TpuBackend
        with tempfile.TemporaryDirectory() as d:
            make_dataset(d, 2048)
            base = rss_mb()
            run_once(d, os.path.join(d, "out"), TpuBackend(),
                     group_size=512)
            grown = rss_mb() - base
            mb_per_iter = None
    else:
        raise SystemExit(f"unknown mode {which}")

    out = {"mode": which, "iters": iters, "backend": jax.default_backend(),
           "jax": jax.__version__, "rss_grown_mb": grown}
    if mb_per_iter:
        out["leak_fraction_of_uploaded"] = round(
            grown / (iters * mb_per_iter), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
