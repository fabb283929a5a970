"""Training-step tests: jitted DINER step decreases loss on the sphere scene;
losses match torch re-statements; patch selection respects the fg mask."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp
import torch

from diner_tpu.data.synthetic import make_sphere_scene
from diner_tpu.losses import antibias_loss, init_vgg19_params, vgg_loss
from diner_tpu.models.pixelnerf import PixelNeRFConfig
from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
from diner_tpu.renderer import RendererConfig
from diner_tpu.train.diner import (
    DinerConfig,
    create_state,
    make_train_step,
    make_eval_step,
    select_pixels,
)


def _tiny_cfg(**kw):
    return DinerConfig(
        nerf=PixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                                         image_padding=8, padding_pe=4),
            d_hidden=64,
        ),
        renderer=RendererConfig(n_samples=12, n_depth_candidates=64,
                                n_gaussian=4, white_bkgd=True, ray_chunk=128),
        ray_batch_size=32,
        lr=5e-4,
        **kw,
    )


@pytest.mark.slow
def test_train_step_decreases_loss():
    batch = make_sphere_scene(H=24, W=24, nv=2)
    cfg = _tiny_cfg()
    model, state = create_state(cfg, jax.random.PRNGKey(3), batch)
    train_step = jax.jit(make_train_step(model, cfg))

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 12
    # loss trends down on an overfit-able single batch
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.slow
def test_eval_step_renders_images():
    batch = make_sphere_scene(H=24, W=24, nv=2)
    cfg = _tiny_cfg()
    model, state = create_state(cfg, jax.random.PRNGKey(3), batch)
    eval_step = jax.jit(make_eval_step(model, cfg))
    rgb, depth = eval_step(state, batch, jax.random.PRNGKey(1))
    assert rgb.shape == (1, 24, 24, 3)
    assert depth.shape == (1, 24, 24)
    assert np.isfinite(np.asarray(rgb)).all()


def test_select_pixels_patch_mode_respects_mask():
    batch = make_sphere_scene(H=32, W=32, nv=2)
    cfg = _tiny_cfg().__class__(**{**_tiny_cfg().__dict__,
                                   "w_vgg": 0.1, "vgg_spatch": 8})
    idcs = np.asarray(select_pixels(cfg, batch, jax.random.PRNGKey(0)))
    assert idcs.shape == (1, 64)
    H = W = 32
    assert (idcs >= 0).all() and (idcs < H * W).all()
    # patch must be a contiguous 8x8 block
    xs = idcs[0] % W
    ys = idcs[0] // W
    assert xs.max() - xs.min() == 7
    assert ys.max() - ys.min() == 7
    # center of the patch lies on the fg mask
    alpha = np.asarray(batch["target_alpha"][0, :, :, 0])
    cx, cy = int(np.median(xs)), int(np.median(ys))
    assert alpha[max(cy - 4, 0):cy + 4, max(cx - 4, 0):cx + 4].sum() > 0


def test_antibias_loss_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    y = rng.rand(2, 16, 16, 3).astype(np.float32)
    ours = float(antibias_loss(jnp.asarray(x), jnp.asarray(y), 3))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
    pool = torch.nn.AvgPool2d(kernel_size=8, stride=8)
    ref = torch.nn.L1Loss()(pool(xt), pool(yt)).item()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.slow
def test_vgg_loss_runs_and_differentiates():
    params = init_vgg19_params(0)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)

    val = float(vgg_loss(params, x, y))
    assert np.isfinite(val) and val > 0
    g = jax.grad(lambda p: vgg_loss(params, p, y))(x)
    assert float(jnp.linalg.norm(g)) > 0
    assert float(vgg_loss(params, y, y)) == 0.0


@pytest.mark.slow
def test_vgg_loss_bf16_close_to_f32():
    """Mixed-precision VGG path (production recipe) tracks the f32 loss."""
    import jax.numpy as jnp
    params = init_vgg19_params(0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    y = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    f32 = float(vgg_loss(params, x, y))
    bf16 = float(vgg_loss(params, x, y, dtype=jnp.bfloat16))
    assert abs(f32 - bf16) / max(abs(f32), 1e-8) < 0.05
