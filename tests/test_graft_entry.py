"""Driver entry-point contracts (__graft_entry__.py).

entry() must stay jittable; _needs_cpu_force must treat the jax.config
platform string as authoritative (this box's sitecustomize pins
jax_platforms='axon,cpu' OVERRIDING the JAX_PLATFORMS env var, so an
env-first check skipped the cpu-mesh fix exactly when the driver
exported JAX_PLATFORMS=cpu itself — the round-2 dryrun regression)."""

import sys

import jax
import pytest

sys.path.insert(0, ".")

import __graft_entry__ as ge  # noqa: E402


@pytest.mark.parametrize("config,env,expect", [
    ("axon,cpu", "cpu", True),    # the regression: sitecustomize override
    ("axon,cpu", "", True),
    ("", "", True),               # nothing pinned: force
    ("", "cpu", False),           # no sitecustomize ran: env is trusted
    ("cpu", "", False),           # conftest / caller already arranged cpu
    ("cpu", "cpu", False),
])
def test_needs_cpu_force(config, env, expect):
    assert ge._needs_cpu_force(config, env) is expect


def test_entry_jittable():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    flat = jax.tree_util.tree_leaves(out)
    assert flat and all(hasattr(x, "shape") for x in flat)
