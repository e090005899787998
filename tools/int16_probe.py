#!/usr/bin/env python3
"""Probe: does this toolchain's Mosaic compile int16 max/roll/select?

Round-1/2 finding: int16 DP state would halve the native-tile count of
both the profile and align kernels (native int16 tile is (16, 128)), but
Mosaic rejected int16 max/roll/select at the time.  Run this when the
toolchain updates; if all probes pass, the int16 variants are worth
building (VERDICT r2 item 8).

Exit 0 = all ops compile and run correctly on the live device.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def kernel(x_ref, y_ref, o_ref):
    x = x_ref[:]
    y = y_ref[:]
    m = jnp.maximum(x, y)                      # int16 max
    r = pltpu.roll(m, shift=3, axis=1)         # int16 roll
    karr = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = jnp.where(karr >= 3, r, jnp.int16(-16000))   # int16 select
    o_ref[:] = s + jnp.int16(1)                # int16 add


def main():
    B, W = 16, 128
    rng = np.random.default_rng(0)
    x = rng.integers(-10000, 10000, (B, W)).astype(np.int16)
    y = rng.integers(-10000, 10000, (B, W)).astype(np.int16)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int16),
    )
    try:
        got = np.asarray(fn(x, y))
    except Exception as exc:  # noqa: BLE001
        print(f"INT16 NOT SUPPORTED: {type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:200]}")
        sys.exit(1)
    m = np.maximum(x, y)
    r = np.roll(m, 3, axis=1)
    want = np.where(np.arange(W)[None, :] >= 3, r,
                    np.int16(-16000)).astype(np.int16) + 1
    if np.array_equal(got, want):
        print("INT16 OK: max/roll/select/add compile and match")
        sys.exit(0)
    print("INT16 MISCOMPILES: output mismatch")
    sys.exit(2)


if __name__ == "__main__":
    main()
