"""The fused single-gather map sampler must match the three-gather
reference path bit-for-bit (same texel choice, exponential growth, masks)."""

import numpy as np
import jax.numpy as jnp

from diner_tpu.ops.sampling import sample_view_maps, sample_view_maps_fused
from tests.test_sampling import _make_scene


def test_fused_map_sampling_matches_reference_path():
    rays, views, scene = _make_scene(SB=1, NV=2, NR=8, H=24, W=28)
    rng = np.random.RandomState(0)
    # uv spanning inside, border ring, deep padded ring, and beyond pad
    uv = (rng.rand(1, 2, 4000, 2).astype(np.float32) * 2 - 1) * 2.5
    uv = jnp.asarray(uv)

    d0, s0, n0 = sample_view_maps(views, uv)
    d1, s1, n1 = sample_view_maps_fused(views, uv)

    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
