"""Parity tests for the depth-guided sampler and compositing ops against
torch re-statements of the reference algorithm (``src/models/nerf_renderer.py``)
with injected randomness.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from diner_tpu.ops.sampling import (
    ViewMaps,
    stratified_z,
    sample_depthguided,
    fill_up_uniform,
    weighted_mean_std,
)
from diner_tpu.ops.composite import composite


# ---------------------------------------------------------------- fixtures

def _make_scene(seed=0, SB=1, NV=2, NR=16, H=24, W=28):
    """Synthetic multi-view scene with smooth depth + an invalid hole."""
    rng = np.random.RandomState(seed)

    # cameras looking down +z from slightly different positions
    poses = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    for v in range(NV):
        poses[:, v, 0, 3] = 0.1 * v
        poses[:, v, 1, 3] = -0.05 * v
    focal = np.full((SB, NV, 2), 35.0, np.float32)
    c = np.stack([np.full((SB, NV), W / 2, np.float32),
                  np.full((SB, NV), H / 2, np.float32)], -1)

    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    base = (1.5 + 0.1 * np.sin(3 * gx) * np.cos(2 * gy)).astype(np.float32)
    depths = np.tile(base, (SB, NV, 1, 1))[..., None]
    depths[:, :, 2:6, 3:8] = 0.0
    stds = np.abs(rng.randn(SB, NV, H, W, 1).astype(np.float32)) * 0.01 + 0.02
    stds[depths == 0] = 0.0
    normals = np.zeros((SB, NV, H, W, 3), np.float32)
    normals[..., 2] = -1.0  # facing the cameras
    normals[depths[..., 0] == 0] = 0.0

    # target rays: roughly through the volume
    origins = np.zeros((SB, NR, 3), np.float32)
    origins[..., 2] = -0.2
    dirs = rng.randn(SB, NR, 3).astype(np.float32) * 0.05
    dirs[..., 2] = 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    near = np.full((SB, NR, 1), 0.8, np.float32)
    far = np.full((SB, NR, 1), 2.2, np.float32)
    rays = np.concatenate([origins, dirs, near, far], axis=-1)

    views = ViewMaps(
        depths=jnp.asarray(depths),
        depth_stds=jnp.asarray(stds),
        normals=jnp.asarray(normals),
        poses=jnp.asarray(poses),
        focal=jnp.asarray(focal),
        c=jnp.asarray(c),
        image_wh=jnp.asarray([float(W), float(H)]),
    )
    return rays, views, dict(depths=depths, stds=stds, normals=normals,
                             poses=poses, focal=focal, c=c, H=H, W=W)


# ------------------------------------------------- torch reference sampler

def _torch_grid_point_sample(maps_nhwc, uv, mode, padding_mode):
    """maps (SBNV, H, W, C), uv (SBNV, P, 2) → (SBNV, P, C)."""
    img = torch.from_numpy(np.transpose(maps_nhwc, (0, 3, 1, 2)))
    grid = torch.from_numpy(uv)[:, :, None, :]
    out = F.grid_sample(img, grid, mode=mode, padding_mode=padding_mode,
                        align_corners=False)
    return out[:, :, :, 0].permute(0, 2, 1).numpy()


def _torch_exp_point_sample(maps_nhwc, uv, pad_size=100, double_width=12.0):
    from tests.test_grid_sample import _torch_exponential_reference
    return _torch_exponential_reference(maps_nhwc, uv, pad_size, double_width)


def _torch_sample_depthguided(rays, scene, n_samples, n_cand, u_coarse,
                              gauss_noise, n_gaussian, depth_diff_max=0.05):
    """Re-statement of reference sample_depthguided with injected noise."""
    SB, NR, _ = rays.shape
    NV = scene["poses"].shape[1]
    H, W = scene["H"], scene["W"]

    near, far = rays[..., 6:7], rays[..., 7:8]
    step = 1.0 / n_cand
    t = np.arange(n_cand, dtype=np.float32) * step + u_coarse * step
    z = near * (1 - t) + far * t  # (SB, NR, K)
    step_size = (rays[..., 7] - rays[..., 6]) / n_cand  # (SB, NR)

    xyz = rays[..., None, :3] + z[..., None] * rays[..., None, 3:6]
    xyz = xyz.reshape(SB, 1, -1, 3)
    R = scene["poses"][:, :, :3, :3]
    tvec = scene["poses"][:, :, :3, 3]
    xyz_cam = np.einsum("svij,svbj->svbi", R, np.tile(xyz, (1, NV, 1, 1))) \
        + tvec[:, :, None]
    dirs_cam = np.einsum("svij,svbj->svbi", R,
                         np.tile(rays[..., None, 3:6].transpose(0, 2, 1, 3)
                                 .reshape(SB, 1, NR, 3), (1, NV, 1, 1)))
    point_dirs = np.repeat(dirs_cam, n_cand, axis=2)

    uv = xyz_cam[..., :2] / xyz_cam[..., 2:]
    uv = uv * scene["focal"][:, :, None] + scene["c"][:, :, None]
    uv = uv / np.array([W, H], np.float32) * 2 - 1

    uv_f = uv.reshape(SB * NV, -1, 2).astype(np.float32)
    d = _torch_grid_point_sample(scene["depths"].reshape(SB * NV, H, W, 1),
                                 uv_f, "nearest", "border")[..., 0]
    s = _torch_exp_point_sample(scene["stds"].reshape(SB * NV, H, W, 1),
                                uv_f)[..., 0]
    n = _torch_grid_point_sample(scene["normals"].reshape(SB * NV, H, W, 3),
                                 uv_f, "nearest", "zeros")
    d = d.reshape(SB, NV, -1)
    s = s.reshape(SB, NV, -1)
    n = n.reshape(SB, NV, -1, 3)

    ref_z = xyz_cam[..., 2]
    cos = np.sum(point_dirs * n, axis=-1)
    stepm = np.repeat(step_size, n_cand, axis=1).reshape(SB, 1, -1)
    stepm = np.tile(stepm, (1, NV, 1))
    mask = (s != 0) & (np.abs(d - ref_z) < depth_diff_max) & (cos <= 0)
    lik = np.zeros_like(d)
    from scipy.special import erf as sp_erf
    sqrt2 = np.sqrt(2.0)
    sel = mask
    lik[sel] = 0.5 * np.abs(
        sp_erf((ref_z[sel] + stepm[sel] / 2 - d[sel]) / (s[sel] * sqrt2))
        - sp_erf((ref_z[sel] - stepm[sel] / 2 - d[sel]) / (s[sel] * sqrt2)))
    lik = lik.max(axis=1).reshape(SB, NR, n_cand)
    opaque = lik.copy()
    opaque[..., 1:] *= np.cumprod(1 - lik, axis=-1)[..., :-1]

    order = np.argsort(-lik, axis=-1, kind="stable")[..., :n_samples]
    sel_lik = np.take_along_axis(lik, order, axis=-1)
    z_sel = np.take_along_axis(z, order, axis=-1)
    z_sel[sel_lik == 0] = 0.0

    if n_gaussian > 0:
        ray_mask = np.any(opaque != 0, axis=-1)
        wsum = opaque.sum(-1, keepdims=True)
        wsum[wsum == 0] = 1.0
        wn = opaque / wsum
        mean = (z * wn).sum(-1, keepdims=True)
        std = np.sqrt(((z - mean) ** 2 * wn).sum(-1, keepdims=True))
        gauss = gauss_noise * std + mean
        gauss[~ray_mask] = 0.0
        z_sel[..., -n_gaussian:] = gauss
    return z_sel.astype(np.float32), lik, opaque


def test_sample_depthguided_matches_reference():
    rays, views, scene = _make_scene()
    SB, NR = rays.shape[:2]
    n_cand, n_samples, n_gauss = 200, 24, 8
    rng = np.random.RandomState(1)
    u = rng.rand(SB, NR, n_cand).astype(np.float32)
    gn = rng.randn(SB, NR, n_gauss).astype(np.float32)

    ours = np.asarray(sample_depthguided(
        jnp.asarray(rays), views, n_samples, n_cand,
        jnp.asarray(u), jnp.asarray(gn), n_gauss))
    ref, lik, opaque = _torch_sample_depthguided(
        rays, scene, n_samples, n_cand, u, gn, n_gauss)

    assert (lik > 0).any(), "fixture produced no surface hits"
    # compare as sorted sets per ray (tie order among equal likelihoods may
    # legitimately differ between top_k and argsort)
    np.testing.assert_allclose(np.sort(ours, -1), np.sort(ref, -1),
                               atol=1e-4, rtol=1e-4)


def test_fill_up_uniform_matches_reference():
    rng = np.random.RandomState(2)
    SB, NR, S = 2, 10, 12
    z = rng.rand(SB, NR, S).astype(np.float32) * 1.5 + 0.5
    # punch empty slots, a full-empty ray, and a negative (gaussian) sample
    z[z < 0.9] = 0.0
    z[0, 0] = 0.0
    z[1, 3, 0] = -0.2
    rays = np.zeros((SB, NR, 8), np.float32)
    rays[..., 6] = 0.5
    rays[..., 7] = 2.0
    u = rng.rand(SB, NR, S).astype(np.float32)

    ours = np.asarray(fill_up_uniform(jnp.asarray(z), jnp.asarray(rays),
                                      jnp.asarray(u)))

    # torch re-statement of fill_up_uniform_samples with the same uniforms
    zt = torch.from_numpy(z).sort(dim=-1).values.view(-1, S)
    rt = torch.from_numpy(rays).view(-1, 8)
    ut = torch.from_numpy(u)
    missing = zt == 0
    iray, isamp = torch.where(missing)
    n_missing = missing.int().sum(-1)[iray]
    nears, fars = rt[iray, 6], rt[iray, 7]
    step = (fars - nears) / n_missing
    # injected uniforms correspond to sorted slot positions
    uflat = ut.view(-1, S)[iray, isamp]
    z_missing = nears + isamp * step + uflat * step
    zt[iray, isamp] = z_missing
    ref = zt.view(SB, NR, S).sort(dim=-1).values.numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-5)
    assert (np.diff(ours, axis=-1) >= 0).all()


def test_weighted_mean_std_matches_reference():
    rng = np.random.RandomState(3)
    x = rng.rand(4, 50).astype(np.float32)
    w = rng.rand(4, 50).astype(np.float32)
    mean, std = weighted_mean_std(jnp.asarray(x), jnp.asarray(w))
    wt = torch.from_numpy(w)
    xt = torch.from_numpy(x)
    wn = wt / wt.sum(dim=-1, keepdims=True)
    mref = (xt * wn).sum(dim=-1, keepdims=True)
    sref = ((xt - mref).pow(2) * wn).sum(dim=-1, keepdims=True).sqrt()
    np.testing.assert_allclose(np.asarray(mean), mref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std), sref.numpy(), atol=1e-5)


def test_composite_matches_reference():
    rng = np.random.RandomState(4)
    SB, B, K = 2, 7, 9
    z = np.sort(rng.rand(SB, B, K).astype(np.float32) * 1.5 + 0.5, axis=-1)
    rgb = rng.rand(SB, B, K, 3).astype(np.float32)
    sigma = rng.randn(SB, B, K).astype(np.float32) * 2
    rays = np.zeros((SB, B, 8), np.float32)
    rays[..., 7] = 2.5

    for white in (False, True):
        out = composite(jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z),
                        jnp.asarray(rays), white_bkgd=white)

        zt = torch.from_numpy(z)
        deltas = torch.cat([zt[..., 1:] - zt[..., :-1],
                            torch.from_numpy(rays[..., 7:8]) - zt[..., -1:]], -1)
        alphas = 1 - torch.exp(-deltas * torch.relu(torch.from_numpy(sigma)))
        shifted = torch.cat([torch.ones_like(alphas[..., :1]),
                             1 - alphas + 1e-10], -1)
        T = torch.cumprod(shifted, -1)
        wref = (alphas * T[..., :-1]).numpy()
        rgb_ref = (torch.from_numpy(rgb) * torch.from_numpy(wref)[..., None]).sum(-2).numpy()
        depth_ref = (wref * z).sum(-1)
        if white:
            rgb_ref = rgb_ref + (1 - wref.sum(-1))[..., None]

        np.testing.assert_allclose(np.asarray(out.weights), wref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), depth_ref, atol=1e-5)


def test_stratified_z_bounds():
    rays = np.zeros((1, 4, 8), np.float32)
    rays[..., 6] = 1.0
    rays[..., 7] = 3.0
    u = np.random.RandomState(0).rand(1, 4, 64).astype(np.float32)
    z = np.asarray(stratified_z(jnp.asarray(rays), 64, jnp.asarray(u)))
    assert (z >= 1.0).all() and (z <= 3.0).all()
    assert (np.diff(z, axis=-1) > 0).all()  # jittered strata stay ordered


# ---------------------------------------------- pruned two-stage sampler

def test_pruned_sampler_matches_full():
    """With the fixture's smooth maps the two-stage shortlist selects the
    same z set as the one-stage sampler (telescoping erf masses put every
    top fine bin inside a top coarse bin)."""
    from diner_tpu.ops.sampling import sample_depthguided_pruned

    rays, views, scene = _make_scene()
    SB, NR = rays.shape[:2]
    n_cand, n_coarse, n_bins, n_samples = 200, 25, 8, 24
    rng = np.random.RandomState(2)
    u = rng.rand(SB, NR, n_cand).astype(np.float32)

    full = np.asarray(sample_depthguided(
        jnp.asarray(rays), views, n_samples, n_cand, jnp.asarray(u)))
    pruned = np.asarray(sample_depthguided_pruned(
        jnp.asarray(rays), views, n_samples, n_cand, n_coarse, n_bins,
        jnp.asarray(u)))

    assert (full > 0).any(), "fixture produced no surface hits"
    # the pruned path scores only 25 + 8*8 = 89 of the 200 candidates; with
    # smooth maps the selected sets must still agree exactly (same grid
    # points, same jitter values)
    np.testing.assert_allclose(np.sort(pruned, -1), np.sort(full, -1),
                               atol=1e-6)


def test_pruned_sampler_gaussian_stats_close():
    """The coarse-profile Gaussian fit tracks the fine-profile fit."""
    from diner_tpu.ops.sampling import sample_depthguided_pruned

    rays, views, scene = _make_scene(seed=3)
    SB, NR = rays.shape[:2]
    n_cand, n_coarse, n_bins, n_samples, n_gauss = 200, 25, 8, 24, 6
    rng = np.random.RandomState(4)
    u = rng.rand(SB, NR, n_cand).astype(np.float32)
    gn = rng.randn(SB, NR, n_gauss).astype(np.float32)

    full = np.asarray(sample_depthguided(
        jnp.asarray(rays), views, n_samples, n_cand,
        jnp.asarray(u), jnp.asarray(gn), n_gauss))
    pruned = np.asarray(sample_depthguided_pruned(
        jnp.asarray(rays), views, n_samples, n_cand, n_coarse, n_bins,
        jnp.asarray(u), jnp.asarray(gn), n_gauss))

    # non-gaussian slots identical (smooth maps), gaussian slots close: the
    # coarse opaque profile integrates the same erf mass as the fine one up
    # to a jitter term, so mean/std (hence the reparameterized draws) agree
    # to a few percent of the ray range
    np.testing.assert_allclose(
        np.sort(pruned[..., :-n_gauss], -1),
        np.sort(full[..., :-n_gauss], -1), atol=1e-6)
    ray_range = float(rays[0, 0, 7] - rays[0, 0, 6])
    both_live = (np.abs(full[..., -n_gauss:]) > 0) \
        & (np.abs(pruned[..., -n_gauss:]) > 0)
    assert both_live.any()
    diff = np.abs(pruned[..., -n_gauss:] - full[..., -n_gauss:])[both_live]
    assert diff.max() < 0.05 * ray_range, diff.max()


def test_pruned_sampler_renderer_flag():
    """RendererConfig.n_coarse_candidates routes render_rays through the
    pruned sampler and produces finite output of the right shape."""
    import jax
    from diner_tpu.renderer import RendererConfig, render_rays

    rays, views, scene = _make_scene(seed=5)

    class _Ctx:
        def view_maps(self):
            return views

    def field_fn(ctx, xyz, dirs):
        sigma = jnp.ones(xyz.shape[:-1] + (1,), xyz.dtype) * 3.0
        rgb = (jnp.tanh(xyz) + 1) / 2
        return jnp.concatenate([rgb, sigma], -1)

    cfg = RendererConfig(n_samples=16, n_depth_candidates=200,
                         n_gaussian=4, white_bkgd=False,
                         n_coarse_candidates=25, n_refine_bins=8)
    out = render_rays(field_fn, _Ctx(), jnp.asarray(rays),
                      jax.random.PRNGKey(0), cfg)
    assert out.rgb.shape == rays.shape[:2] + (3,)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert np.isfinite(np.asarray(out.depth)).all()
