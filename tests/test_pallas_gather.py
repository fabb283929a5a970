"""Parity for the Pallas DMA row-gather certification kernel.

The kernel is a certification artifact (it measured SLOWER than XLA's
flat take — GATHER_LAB.json, BENCH.md round 4) but must stay correct so
future re-certifications are trustworthy. On CPU it runs in interpreter
mode; the TPU path is exercised by scripts/gather_lab.py on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("dtype,C", [("float32", 128), ("float32", 256),
                                     ("bfloat16", 512)])
def test_row_gather_parity_interpret(dtype, C):
    from jax.experimental.pallas import tpu as pltpu
    from diner_tpu.ops.pallas.gather_pallas import pallas_row_gather

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((300, C)), dtype)
    idx = jnp.asarray(rng.integers(0, 300, 2500), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_row_gather(table, idx, blk=1024, depth=8)
    ref = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(
        np.asarray(out).astype(np.float32), ref.astype(np.float32))


def test_row_gather_rejects_unaligned_rows():
    from diner_tpu.ops.pallas.gather_pallas import pallas_row_gather
    table = jnp.zeros((16, 5), jnp.float32)  # the sampler's map-row shape
    idx = jnp.zeros((8,), jnp.int32)
    with pytest.raises(ValueError, match="128-lane"):
        pallas_row_gather(table, idx, blk=1024, depth=4)
