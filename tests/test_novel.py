"""NOVEL variant tests: kNN deformation parity, gen-latent plane sampling,
end-to-end deformed render, dense regressor training smoke."""

import pytest

import numpy as np
import torch
import jax
import jax.numpy as jnp

from diner_tpu.data.synthetic import make_sphere_scene
from diner_tpu.geometry import gen_rays
from diner_tpu.models.novel.model import (
    GenContext,
    NovelPixelNeRF,
    NovelPixelNeRFConfig,
    make_gen_context,
)
from diner_tpu.models.novel.renderer import render_rays_novel
from diner_tpu.models.novel.regressor import (
    DenseRegressorConfig,
    create_regressor_state,
    make_regressor_train_step,
)
from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
from diner_tpu.ops.knn import deform_points, knn1
from diner_tpu.renderer import RendererConfig


def test_knn1_matches_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.randn(2, 500, 3).astype(np.float32)
    verts = rng.randn(2, 137, 3).astype(np.float32)
    ours = np.asarray(knn1(jnp.asarray(pts), jnp.asarray(verts), chunk=64))
    d = ((pts[:, :, None] - verts[:, None]) ** 2).sum(-1)
    ref = d.argmin(-1)
    np.testing.assert_array_equal(ours, ref)


def test_deform_points_matches_reference_semantics():
    rng = np.random.RandomState(1)
    SB, B, V = 2, 64, 40
    pts = rng.randn(SB, B, 3).astype(np.float32)
    verts = rng.randn(SB, V, 3).astype(np.float32)
    offs = rng.randn(SB, V, 3).astype(np.float32) * 0.1
    ours = np.asarray(deform_points(jnp.asarray(pts), jnp.asarray(verts),
                                    jnp.asarray(offs), chunk=32))
    # torch re-statement (nerf_novel_renderer.py:40-50) with brute-force knn
    d = ((pts[:, :, None] - verts[:, None]) ** 2).sum(-1)
    idx = torch.from_numpy(d).argmin(-1)
    closest = torch.from_numpy(offs)[
        torch.arange(SB).unsqueeze(1), idx, :]
    ref = torch.from_numpy(pts) + closest
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def _novel_setup(use_pe=False):
    batch = make_sphere_scene(H=24, W=24, nv=2)
    cfg = NovelPixelNeRFConfig(
        encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                                     image_padding=8, padding_pe=4),
        d_hidden=32, gen_latent_hw=48, gen_latent_ch=64 + 64 + 128 + 256,
        use_pe_maps=use_pe)
    model = NovelPixelNeRF(cfg=cfg)
    H = W = 24
    gen_kwargs = {}
    if use_pe:
        gen_kwargs = dict(
            src_pe_maps=jnp.ones((1, 2, 16, 16, 3)),
            tgt_pe_map=jnp.ones((1, 1, 16, 16, 3)))
    gen = make_gen_context(batch["target_extrinsics"],
                           batch["target_intrinsics"], (W, H), **gen_kwargs)
    variables = model.init(
        jax.random.PRNGKey(3),
        batch["src_rgbs"], batch["src_depths"], batch["src_depth_stds"],
        batch["src_extrinsics"], batch["src_intrinsics"], gen,
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    return batch, cfg, model, gen, variables


@pytest.mark.slow
def test_novel_render_end_to_end():
    batch, cfg, model, gen, variables = _novel_setup()
    ctx, _ = model.apply(
        variables, batch["src_rgbs"], batch["src_depths"],
        batch["src_depth_stds"], batch["src_extrinsics"],
        batch["src_intrinsics"], train=True, method="encode",
        mutable=["batch_stats"])

    H = W = 24
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, batch["znear"], batch["zfar"]).reshape(1, H * W, 8)
    rays = rays[:, :32]

    rng = np.random.RandomState(2)
    verts = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32) * 0.3)
    off_src = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32) * 0.02)
    off_gen = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32) * 0.02)

    def field_fn(c, g, xyz, gxyz, vd):
        return model.apply(variables, c, g, xyz, gxyz, vd, method="field")

    rcfg = RendererConfig(n_samples=8, n_depth_candidates=32, n_gaussian=2,
                          white_bkgd=True)
    out = render_rays_novel(field_fn, ctx, gen, rays, verts, off_src,
                            off_gen, jax.random.PRNGKey(1), rcfg)
    assert out.rgb.shape == (1, 32, 3)
    assert np.isfinite(np.asarray(out.rgb)).all()

    # gradient flows into the learnable latent plane
    def loss(params):
        v = {**variables, "params": params}

        def ff(c, g, xyz, gxyz, vd):
            return model.apply(v, c, g, xyz, gxyz, vd, method="field")

        o = render_rays_novel(ff, ctx, gen, rays, verts, off_src, off_gen,
                              jax.random.PRNGKey(1), rcfg)
        return jnp.mean(o.rgb ** 2)

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.linalg.norm(g["gen_latent"])) > 0


@pytest.mark.slow
def test_novel_pe_variant_field():
    batch, cfg, model, gen, variables = _novel_setup(use_pe=True)
    ctx, _ = model.apply(
        variables, batch["src_rgbs"], batch["src_depths"],
        batch["src_depth_stds"], batch["src_extrinsics"],
        batch["src_intrinsics"], train=True, method="encode",
        mutable=["batch_stats"])
    xyz = jnp.zeros((1, 16, 3)) + jnp.asarray([0.0, 0.0, 0.1])
    out = model.apply(variables, ctx, gen, xyz, xyz,
                      jnp.ones((1, 16, 3)) / np.sqrt(3.0), method="field")
    assert out.shape == (1, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    assert "deformation_layer" in variables["params"]


@pytest.mark.slow
def test_dense_regressor_train_step():
    rng = np.random.RandomState(3)
    cfg = DenseRegressorConfig(backbone="resnet18", num_point=100,
                               dim_output=2, lr=1e-3)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    kpts = jnp.asarray(rng.rand(2, 100, 2).astype(np.float32))
    model, state, tx = create_regressor_state(cfg, jax.random.PRNGKey(0),
                                              imgs)
    step = jax.jit(make_regressor_train_step(model, tx))
    losses = []
    for _ in range(5):
        state, m = step(state, {"image": imgs, "target_keypoints": kpts})
        losses.append(float(m["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
