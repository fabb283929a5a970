"""End-to-end renderer tests: PixelNeRF field + depth-guided renderer on a
synthetic multi-view scene. Checks shapes, determinism, gradient flow, and
that depth-guided sampling actually concentrates samples near the surface.
"""

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from diner_tpu.geometry import gen_rays
from diner_tpu.models.pixelnerf import PixelNeRF, PixelNeRFConfig
from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
from diner_tpu.renderer import RendererConfig, render_rays, render_rays_chunked
from diner_tpu.data.synthetic import make_sphere_scene


def _small_model():
    cfg = PixelNeRFConfig(
        encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                                     image_padding=8, padding_pe=4),
        d_hidden=64,
    )
    return PixelNeRF(cfg=cfg)


def _encode(model, variables, batch):
    ctx, _ = model.apply(
        variables,
        batch["src_rgbs"], batch["src_depths"], batch["src_depth_stds"],
        batch["src_extrinsics"], batch["src_intrinsics"],
        train=True, method="encode", mutable=["batch_stats"],
    )
    return ctx


@pytest.mark.slow
def test_render_end_to_end():
    batch = make_sphere_scene(H=32, W=32, nv=2)
    model = _small_model()
    key = jax.random.PRNGKey(0)
    variables = model.init(
        key,
        batch["src_rgbs"], batch["src_depths"], batch["src_depth_stds"],
        batch["src_extrinsics"], batch["src_intrinsics"],
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)),
    )
    ctx = _encode(model, variables, batch)

    SB, H, W = 1, 32, 32
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, batch["znear"], batch["zfar"]).reshape(SB, H * W, 8)
    rays = rays[:, :64]

    def field_fn(c, xyz, vd):
        return model.apply(variables, c, xyz, vd, method="field")

    rcfg = RendererConfig(n_samples=16, n_depth_candidates=100, n_gaussian=6,
                          white_bkgd=True)
    out = render_rays(field_fn, ctx, rays, jax.random.PRNGKey(1), rcfg,
                      want_weights=True)
    assert out.rgb.shape == (SB, 64, 3)
    assert out.depth.shape == (SB, 64)
    assert out.weights.shape == (SB, 64, 16)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert np.isfinite(np.asarray(out.depth)).all()

    # determinism: same key → identical output
    out2 = render_rays(field_fn, ctx, rays, jax.random.PRNGKey(1), rcfg)
    np.testing.assert_array_equal(np.asarray(out.rgb), np.asarray(out2.rgb))

    # chunked path agrees in shape and stays finite
    outc = render_rays_chunked(
        field_fn, ctx, rays, jax.random.PRNGKey(1),
        RendererConfig(n_samples=16, n_depth_candidates=100, n_gaussian=6,
                       white_bkgd=True, ray_chunk=32))
    assert outc.rgb.shape == (SB, 64, 3)
    assert np.isfinite(np.asarray(outc.rgb)).all()

    # the eval fast path (wide-row pair-table latent lookup) is opt-in via
    # ctx.with_latent_pairs() — the renderer deliberately does NOT attach
    # it (lost end-to-end, EVAL_RENDER_r04) — and must not change the render
    outp = render_rays(field_fn, ctx.with_latent_pairs(), rays,
                       jax.random.PRNGKey(1), rcfg)
    np.testing.assert_allclose(np.asarray(outp.rgb), np.asarray(out.rgb),
                               atol=1e-5, rtol=1e-5)
    if ctx.latent.shape[3] % 2 == 0:
        assert ctx.with_latent_pairs().latent_pairs is not None


@pytest.mark.slow
def test_depth_guided_sampling_concentrates_on_surface():
    """Rays through the sphere should get samples near the analytic depth."""
    from diner_tpu.ops.sampling import sample_depthguided

    batch = make_sphere_scene(H=32, W=32, nv=2)
    model = _small_model()
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["src_rgbs"], batch["src_depths"], batch["src_depth_stds"],
        batch["src_extrinsics"], batch["src_intrinsics"],
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)),
    )
    ctx = _encode(model, variables, batch)

    H = W = 32
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, batch["znear"], batch["zfar"]).reshape(1, H * W, 8)
    # center rays hit the sphere
    center = (H // 2) * W + W // 2
    rays = rays[:, center - 2: center + 2]

    key = jax.random.PRNGKey(3)
    u = jax.random.uniform(key, (1, 4, 200))
    gn = jax.random.normal(key, (1, 4, 4))
    z = np.asarray(sample_depthguided(rays, ctx.view_maps(), 12, 200, u, gn, 4))
    hit = z[z > 0]
    assert hit.size > 0
    # expected depth of the sphere front along the center ray
    gt = batch["target_depth"][0, H // 2, W // 2, 0]
    assert np.abs(np.median(hit) - gt) < 0.15


@pytest.mark.slow
def test_render_gradients_flow_to_params():
    batch = make_sphere_scene(H=24, W=24, nv=2)
    model = _small_model()
    # seed chosen so the sigma channel is alive at init (with the test's
    # small d_hidden a random head can start all-negative and relu-dead;
    # at the real d_hidden=512 this is vanishingly unlikely)
    variables = model.init(
        jax.random.PRNGKey(3),
        batch["src_rgbs"], batch["src_depths"], batch["src_depth_stds"],
        batch["src_extrinsics"], batch["src_intrinsics"],
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)),
    )
    params = variables["params"]
    stats = variables["batch_stats"]

    H = W = 24
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, batch["znear"], batch["zfar"]).reshape(1, H * W, 8)
    rays = rays[:, :32]
    gt = jnp.ones((1, 32, 3)) * 0.5
    rcfg = RendererConfig(n_samples=12, n_depth_candidates=64, n_gaussian=4,
                          white_bkgd=True)

    def loss_fn(p):
        v = {"params": p, "batch_stats": stats}
        ctx, _ = model.apply(
            v, batch["src_rgbs"], batch["src_depths"],
            batch["src_depth_stds"], batch["src_extrinsics"],
            batch["src_intrinsics"], train=True, method="encode",
            mutable=["batch_stats"])

        def field_fn(c, xyz, vd):
            return model.apply(v, c, xyz, vd, method="field")

        out = render_rays(field_fn, ctx, rays, jax.random.PRNGKey(2), rcfg)
        return jnp.mean((out.rgb - gt) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in leaves]
    assert all(np.isfinite(n) for n in norms)
    # the MLP must receive gradient signal
    mlp_norm = float(
        jnp.linalg.norm(grads["mlp"]["lin_out"]["kernel"]))
    assert mlp_norm > 0
