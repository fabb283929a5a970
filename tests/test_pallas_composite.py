"""Pallas fused compositing: forward and custom-VJP parity against the XLA
composite (interpreter mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diner_tpu.ops.composite import composite
from diner_tpu.ops.pallas.composite_pallas import composite_pallas


def _case(seed=0, SB=2, B=37, K=12):
    rng = np.random.RandomState(seed)
    z = np.sort(rng.rand(SB, B, K).astype(np.float32) * 1.5 + 0.5, axis=-1)
    rgb = rng.rand(SB, B, K, 3).astype(np.float32)
    sigma = (rng.randn(SB, B, K) * 2).astype(np.float32)
    rays = np.zeros((SB, B, 8), np.float32)
    rays[..., 7] = 2.5
    return (jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z),
            jnp.asarray(rays))


@pytest.mark.parametrize("white", [False, True])
def test_forward_parity(white):
    rgb, sigma, z, rays = _case()
    ref = composite(rgb, sigma, z, rays, white_bkgd=white)
    out = composite_pallas(rgb, sigma, z, rays, white_bkgd=white,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights),
                               np.asarray(ref.weights), atol=1e-6)


@pytest.mark.parametrize("white", [False, True])
def test_gradient_parity(white):
    rgb, sigma, z, rays = _case(seed=1, SB=1, B=19, K=9)

    def loss_ref(rgb_, sigma_):
        o = composite(rgb_, sigma_, z, rays, white_bkgd=white)
        return (jnp.sum(o.rgb * jnp.cos(o.rgb))
                + jnp.sum(o.depth * 0.7)
                + jnp.sum(o.weights ** 2))

    def loss_pl(rgb_, sigma_):
        o = composite_pallas(rgb_, sigma_, z, rays, white_bkgd=white,
                             interpret=True)
        return (jnp.sum(o.rgb * jnp.cos(o.rgb))
                + jnp.sum(o.depth * 0.7)
                + jnp.sum(o.weights ** 2))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(rgb, sigma)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(rgb, sigma)
    np.testing.assert_allclose(np.asarray(g_pl[0]), np.asarray(g_ref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pl[1]), np.asarray(g_ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_ragged_ray_count_padding():
    # R not a multiple of 128 exercises the lane padding path
    rgb, sigma, z, rays = _case(seed=2, SB=1, B=130, K=5)
    ref = composite(rgb, sigma, z, rays, white_bkgd=True)
    out = composite_pallas(rgb, sigma, z, rays, white_bkgd=True,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=1e-5)
