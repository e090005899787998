"""Test config: force JAX onto a virtual 8-device CPU mesh so tests are
hermetic and sharding/multi-chip tests run without TPU hardware.

This environment's sitecustomize imports jax and registers an 'axon' TPU
platform before user code runs, so env vars alone are too late — we must
use jax.config (the backend itself initializes lazily, so XLA_FLAGS set
here is still honored).  Set C3POA_TEST_ON_TPU=1 to run the suite against
the real chip instead."""

import os

if not os.environ.get("C3POA_TEST_ON_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
