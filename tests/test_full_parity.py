"""Capstone end-to-end parity: the full DINER render (encode → depth-guided
sampling → conditioned field → compositing) through this framework vs a
complete torch re-statement of the reference pipeline, with identical
weights (via the converters) and identical injected randomness.

This is BASELINE.json config 1: rendered images and input-pixel gradients
allclose against the (CPU-runnable) reference math.
"""

import pytest

import math

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from diner_tpu.data.synthetic import make_sphere_scene
from diner_tpu.models.pixelnerf import PixelNeRF, PixelNeRFConfig
from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
from diner_tpu.geometry import gen_rays
from diner_tpu.ops.composite import composite
from diner_tpu.ops.sampling import fill_up_uniform, sample_depthguided
from diner_tpu.utils.torch_convert import (
    convert_resnetfc,
    convert_spatial_encoder,
)

from tests.torch_refs import (
    TorchPositionalEncoding,
    TorchResnetFC,
    TorchSpatialEncoder,
    state_dict_numpy,
)
from tests.test_geometry import _torch_depth2normal
from tests.test_sampling import _torch_sample_depthguided

IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


class TorchDiner(torch.nn.Module):
    """Reference PixelNeRF + renderer semantics, composed from the torch
    re-statements (test-only)."""

    def __init__(self, image_padding=8, blocks=(2, 2, 2, 2), d_hidden=64,
                 num_freqs=6, freq_factor=6.28):
        super().__init__()
        self.encoder = TorchSpatialEncoder(image_padding=image_padding,
                                           padding_pe=4, num_layers=4,
                                           blocks=blocks)
        self.poscode = TorchPositionalEncoding(num_freqs, 3, freq_factor, True)
        self.depthcode = TorchPositionalEncoding(num_freqs, 1, freq_factor,
                                                 True)
        d_latent = 64 + 64 + 128 + 256
        d_in = self.poscode.d_out + self.depthcode.d_out + 3
        self.mlp_fine = TorchResnetFC(d_in, 4, 5, d_latent, d_hidden,
                                      combine_layer=3)
        self.feature_padding = image_padding // 2

    def encode(self, images, depths, depths_std, extrinsics, intrinsics):
        # images (SB, NV, 3, H, W) in [0, 1]
        SB, NV, _, H, W = images.shape
        imgs = (images.view(SB * NV, 3, H, W) - IMAGENET_MEAN) / IMAGENET_STD
        normals = torch.from_numpy(_torch_depth2normal(
            depths.view(SB * NV, H, W).detach().numpy(),
            intrinsics.view(SB * NV, 3, 3).numpy())).permute(0, 3, 1, 2)
        latent = self.encoder(imgs)
        self.latent = latent.view(SB, NV, *latent.shape[1:])
        self.depths = depths
        self.normals = normals.view(SB, NV, 3, H, W)
        self.poses = extrinsics
        self.focal = intrinsics[:, :, [0, 1], [0, 1]]
        self.c = intrinsics[:, :, :2, -1]
        self.image_shape = torch.tensor([float(W), float(H)])

    def _uv(self, xyz_cam):
        uv = xyz_cam[..., :2] / xyz_cam[..., 2:]
        uv = uv * self.focal.unsqueeze(-2) + self.c.unsqueeze(-2)
        return uv / self.image_shape * 2 - 1

    def _index_latent(self, uv):
        SB, NV, N, _ = uv.shape
        lat = self.latent.view(SB * NV, *self.latent.shape[-3:])
        size = torch.tensor([lat.shape[-1], lat.shape[-2]]).float()
        uv = uv * ((size - self.feature_padding * 2) / size).view(1, 1, 2)
        s = F.grid_sample(lat, uv.view(SB * NV, N, 1, 2),
                          align_corners=False, mode="bilinear",
                          padding_mode="border")
        return s[:, :, :, 0].view(SB, NV, -1, N)

    def _index_depth(self, uv):
        SB, NV, N, _ = uv.shape
        d = self.depths.view(SB * NV, 1, *self.depths.shape[-2:])
        s = F.grid_sample(d, uv.view(SB * NV, N, 1, 2), align_corners=False,
                          mode="nearest", padding_mode="border")
        return s[:, :, :, 0].view(SB, NV, 1, N)

    def field(self, xyz, viewdirs):
        SB, B, _ = xyz.shape
        NV = self.poses.shape[1]
        xyz = xyz.unsqueeze(1).expand(-1, NV, -1, -1)
        xyz = torch.matmul(self.poses[:, :, :3, :3],
                           xyz.transpose(-2, -1)).transpose(-2, -1) \
            + self.poses[:, :, :3, -1].unsqueeze(-2)
        z_feature = self.poscode(xyz)
        vd = viewdirs.unsqueeze(1).expand(-1, NV, -1, -1)
        vd = torch.matmul(self.poses[:, :, :3, :3],
                          vd.transpose(-1, -2)).transpose(-1, -2)
        z_feature = torch.cat((z_feature, vd), dim=-1)
        uv = self._uv(xyz)
        latent = self._index_latent(uv).transpose(-1, -2)
        ref_depth = self._index_depth(uv)
        depth_dist = ref_depth.squeeze(-2) - xyz[..., -1]
        depth_feature = self.depthcode(depth_dist.unsqueeze(-1))
        mlp_in = torch.cat((latent, z_feature, depth_feature), dim=-1)
        out = self.mlp_fine(mlp_in, combine_dim=1).reshape(SB, B, 4)
        return torch.cat([torch.sigmoid(out[..., :3]),
                          torch.relu(out[..., 3:4])], dim=-1)


def _torch_fill_up(z, rays, u):
    SB, NR, S = z.shape
    zt = z.sort(dim=-1).values.view(-1, S)
    rt = rays.view(-1, 8)
    missing = zt == 0
    iray, isamp = torch.where(missing)
    n_missing = missing.int().sum(-1)[iray]
    step = (rt[iray, 7] - rt[iray, 6]) / n_missing
    z_missing = rt[iray, 6] + isamp * step + u.reshape(-1, S)[iray, isamp] * step
    zt[iray, isamp] = z_missing
    return zt.view(SB, NR, S).sort(dim=-1).values


def _torch_composite(model, rays, z):
    SB, B, K = z.shape
    deltas = torch.cat([z[..., 1:] - z[..., :-1],
                        rays[..., 7:8] - z[..., -1:]], -1)
    pts = rays[..., None, :3] + z.unsqueeze(-1) * rays[..., None, 3:6]
    vd = rays[..., None, 3:6].expand(-1, -1, K, -1)
    out = model.field(pts.reshape(SB, B * K, 3), vd.reshape(SB, B * K, 3))
    out = out.reshape(SB, B, K, 4)
    alphas = 1 - torch.exp(-deltas * torch.relu(out[..., 3]))
    shifted = torch.cat([torch.ones_like(alphas[..., :1]),
                         1 - alphas + 1e-10], -1)
    T = torch.cumprod(shifted, -1)
    w = alphas * T[..., :-1]
    rgb = (w.unsqueeze(-1) * out[..., :3]).sum(-2)
    depth = (w * z).sum(-1)
    return rgb, depth


@pytest.mark.slow
def test_full_render_parity_images_and_gradients():
    H = W = 24
    NR, n_cand, n_samples, n_gauss = 16, 120, 12, 4
    batch = make_sphere_scene(H=H, W=W, nv=2)

    # --- torch reference pipeline ---
    tref = TorchDiner()
    tref.eval()
    src_rgbs_t = torch.from_numpy(
        np.transpose(np.asarray(batch["src_rgbs"]), (0, 1, 4, 2, 3))
    ).clone().requires_grad_(True)
    depths_t = torch.from_numpy(
        np.asarray(batch["src_depths"])[..., 0]).clone()
    stds_np = np.asarray(batch["src_depth_stds"])[..., 0]
    extr_t = torch.from_numpy(np.asarray(batch["src_extrinsics"]))
    intr_t = torch.from_numpy(np.asarray(batch["src_intrinsics"]))
    tref.encode(src_rgbs_t, depths_t, torch.from_numpy(stds_np), extr_t,
                intr_t)

    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, batch["znear"], batch["zfar"]).reshape(1, H * W, 8)
    center = (H // 2) * W + W // 2
    rays_np = np.asarray(rays[:, center - NR // 2: center + NR // 2])
    rays_t = torch.from_numpy(rays_np)

    rng = np.random.RandomState(0)
    u_coarse = rng.rand(1, NR, n_cand).astype(np.float32)
    gauss = rng.randn(1, NR, n_gauss).astype(np.float32)
    u_fill = rng.rand(1, NR, n_samples).astype(np.float32)

    scene = dict(
        depths=np.asarray(batch["src_depths"]),
        stds=stds_np[..., None],
        normals=np.transpose(tref.normals.numpy(), (0, 1, 3, 4, 2)),
        poses=np.asarray(batch["src_extrinsics"]),
        focal=tref.focal.numpy(),
        c=tref.c.numpy(),
        H=H, W=W)
    z_sel, lik, _ = _torch_sample_depthguided(
        rays_np, scene, n_samples, n_cand, u_coarse, gauss, n_gauss)
    assert (lik > 0).any()
    z_t = _torch_fill_up(torch.from_numpy(z_sel), rays_t,
                         torch.from_numpy(u_fill))
    rgb_t, depth_t = _torch_composite(tref, rays_t, z_t)
    loss_t = rgb_t.sum()
    loss_t.backward()
    grad_t = src_rgbs_t.grad.numpy()

    # --- framework pipeline with converted weights ---
    cfg = PixelNeRFConfig(
        encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                                     image_padding=8, padding_pe=4),
        d_hidden=64)
    model = PixelNeRF(cfg=cfg)

    enc_sd = state_dict_numpy(tref.encoder)
    mlp_sd = state_dict_numpy(tref.mlp_fine)
    enc_vars = convert_spatial_encoder(enc_sd, 4, (2, 2, 2, 2))
    mlp_vars = convert_resnetfc(mlp_sd, 5, 3)
    variables = {
        "params": {"encoder": enc_vars["params"],
                   "mlp": mlp_vars["params"]},
        "batch_stats": {"encoder": enc_vars["batch_stats"]},
    }

    def render(src_rgbs):
        ctx = model.apply(variables, src_rgbs, batch["src_depths"],
                          batch["src_depth_stds"], batch["src_extrinsics"],
                          batch["src_intrinsics"], train=False,
                          method="encode")

        z = sample_depthguided(jnp.asarray(rays_np), ctx.view_maps(),
                               n_samples, n_cand, jnp.asarray(u_coarse),
                               jnp.asarray(gauss), n_gauss)
        z = fill_up_uniform(z, jnp.asarray(rays_np), jnp.asarray(u_fill))
        K = n_samples
        pts = (jnp.asarray(rays_np)[..., None, :3]
               + z[..., None] * jnp.asarray(rays_np)[..., None, 3:6])
        vd = jnp.broadcast_to(jnp.asarray(rays_np)[..., None, 3:6],
                              pts.shape)
        out = model.apply(variables, ctx, pts.reshape(1, NR * K, 3),
                          vd.reshape(1, NR * K, 3), method="field")
        out = out.reshape(1, NR, K, 4)
        comp = composite(out[..., :3], out[..., 3], z,
                         jnp.asarray(rays_np), white_bkgd=False)
        return comp.rgb, comp.depth, z

    rgb_j, depth_j, z_j = render(batch["src_rgbs"])

    # identical sample positions (the selected-z multiset sorts identically)
    np.testing.assert_allclose(np.asarray(z_j), z_t.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    # rendered image + depth parity
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.detach().numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(depth_j), depth_t.detach().numpy(),
                               atol=2e-3, rtol=2e-3)

    # pixel-gradient parity: d(sum rgb)/d(source images)
    grad_j = jax.grad(lambda s: jnp.sum(render(s)[0]))(batch["src_rgbs"])
    grad_j = np.transpose(np.asarray(grad_j), (0, 1, 4, 2, 3))
    scale = max(np.abs(grad_t).max(), 1e-8)
    np.testing.assert_allclose(grad_j / scale, grad_t / scale,
                               atol=5e-3)
