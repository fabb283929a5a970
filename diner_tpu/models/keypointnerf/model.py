"""KeypointNeRF — keypoint-conditioned generalizable human/face NeRF (flax).

Parity target: reference ``src/models/keypointnerf.py`` (KeypointNeRF):
  - geometry features from a stacked-hourglass encoder, texture features
    from a ResBlk encoder (inputs scaled to [-1, 1], avg-pool downsampled by
    ds_geo/ds_tex) (:680-718)
  - ``query``: project points into every source view, smooth boundary pixel
    weights, view dropout during training, rel_z_decay keypoint encoding,
    MLPUNetFusion → (sdf, radiance) + IBR color head (:728-886)
  - rendering: ray–bbox intersection clipping, stratified coarse samples,
    contribution-guided importance resampling, alpha compositing with
    alpha = mask·relu(rad) densities (:952-1231)
  - training renders a mask-centered 64×64 patch; evaluation renders strided
    tiles recombined by pixel shuffle (:1062-1078, :997)

Functional port: features and batch data travel explicitly; randomness via
keys; boolean fancy indexing replaced by masked math.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diner_tpu.models.keypointnerf.modules import (
    HGFilterV2,
    IBRRenderingHead,
    MLPUNetFusion,
    ResBlkEncoder,
    rel_z_decay_encoding,
)
from diner_tpu.ops.grid_sample import grid_sample_bilinear


@dataclass(frozen=True)
class KeypointNeRFConfig:
    # spatial keypoint encoding (sp_args)
    sp_level: int = 3
    sp_scale: float = 1.0
    sp_sigma: float = 0.05
    n_kpt: int = 68
    # encoders
    ds_geo: int = 1
    ds_tex: int = 1
    geo_out_ch: int = 64
    geo_n_stack: int = 1
    geo_n_downsample: int = 4
    tex_ngf: int = 64
    tex_n_downsample: int = 3
    tex_n_blocks: int = 4
    tex_n_upsample: int = 2
    tex_out_ch: int = 8
    # fusion MLP
    mlp_dims1: Tuple[int, ...] = (0, 128, 128, 120, 64)  # [0] set from PE dim
    mlp_dims2: Tuple[int, ...] = (128, 64, 64, 2)
    skip_dims: Tuple[int, ...] = (64, 8)
    skip_layers: Tuple[int, ...] = (0, 2)
    # IBR head
    ibr_in_channels: int = 32
    gcompress_in: int = 128
    gcompress_out: int = 24
    # rendering
    train_out_h: int = 64
    train_out_w: int = 64
    dr_level: int = 5
    sample_per_ray_c: int = 64
    sample_per_ray_f: int = 64
    fine: bool = True
    rand_noise_std: float = 0.01
    nml_scale: float = 100.0
    znear: float = 1.0
    zfar: float = 2.5

    @property
    def sp_dim(self) -> int:
        return (1 + 2 * self.sp_level) * self.n_kpt


class KeypointNeRF(nn.Module):
    cfg: KeypointNeRFConfig = KeypointNeRFConfig()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.geo_encoder = HGFilterV2(
            out_ch=cfg.geo_out_ch, n_stack=cfg.geo_n_stack,
            n_downsample=cfg.geo_n_downsample, dtype=self.dtype)
        self.tex_encoder = ResBlkEncoder(
            out_ch=cfg.tex_out_ch, ngf=cfg.tex_ngf,
            n_downsample=cfg.tex_n_downsample, n_blocks=cfg.tex_n_blocks,
            n_upsample=cfg.tex_n_upsample, dtype=self.dtype)
        dims1 = (cfg.sp_dim,) + tuple(cfg.mlp_dims1[1:])
        self.mlp_geo = MLPUNetFusion(
            n_dims1=dims1, n_dims2=cfg.mlp_dims2, skip_dims=cfg.skip_dims,
            skip_layers=cfg.skip_layers, pool_types=("mean", "var"),
            dtype=self.dtype)
        self.mlp_tex = IBRRenderingHead(in_channels=cfg.ibr_in_channels,
                                        dtype=self.dtype)
        self.ibr_compress_gfeat = nn.Dense(cfg.gcompress_out,
                                           dtype=self.dtype)

    # -------------------------------------------------------- encoders

    def encode_features(self, imgs):
        """imgs (BV, H, W, 3) in [0, 1] → (feat_geo list, feat_tex)."""
        x = imgs
        for _ in range(self.cfg.ds_geo):
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        feat_geo = self.geo_encoder(2.0 * x - 1.0)
        x = imgs
        for _ in range(self.cfg.ds_tex):
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        feat_tex = self.tex_encoder(2.0 * x - 1.0)
        return feat_geo, feat_tex

    # ----------------------------------------------------------- query

    def query(self, pts, view, cam: Dict, feat_geo, feat_tex, imgs, kpt3d,
              src_fg_mask, n_samples: int, train: bool,
              dropout_key: Optional[jax.Array] = None):
        """Evaluate (alpha-logit, sdf, rgb) at world points.

        pts: (B, N, 3); view: (B, N, 3) ray dirs; cam: per-view dicts with
        KRT (BV,4,4), extrin (BV,4,4), width/height/znear/zfar; imgs
        (BV, H, W, 3); kpt3d (B, K, 3); src_fg_mask (BV, H, W, 1).
        Returns (out (B, N, 5) = [sdf, rad, rgb], valid (B, N, 1)).
        """
        cfg = self.cfg
        B, N, _ = pts.shape
        BV = cam["KRT"].shape[0]
        V = BV // B

        v = jnp.broadcast_to(pts[:, None], (B, V, N, 3)).reshape(BV, N, 3)
        vh = jnp.einsum("bij,bnj->bni", cam["KRT"][:, :3, :3], v,
                        precision="highest") + cam["KRT"][:, :3, 3][:, None]
        z = vh[..., 2:3]
        xy = vh[..., :2] / z
        width, height = cam["width"], cam["height"]
        xy = jnp.stack([2.0 * xy[..., 0] / (width - 1.0) - 1.0,
                        2.0 * xy[..., 1] / (height - 1.0) - 1.0], axis=-1)
        zn = 2.0 * (z - cfg.znear) / (cfg.zfar - cfg.znear) - 1.0

        eps = 1e-2
        mask_xy = (xy >= -1.0 - eps) & (xy <= 1.0 + eps)
        mask_z = zn >= -1.0
        out_mask = (mask_xy[..., 0] | mask_xy[..., 1] |
                    mask_z[..., 0])[..., None].astype(jnp.float32)
        out_mask = out_mask.reshape(B, V, N, 1)

        fg = grid_sample_bilinear(src_fg_mask, xy, "border",
                                  align_corners=True)  # (BV, N, 1)
        fg = fg.reshape(B, V, N, 1)
        all_valid = jnp.all(out_mask > 0, axis=1, keepdims=True)
        out_mask = out_mask * jnp.all(fg > 0.1, axis=1, keepdims=True) \
            * all_valid

        if train and V > 1 and dropout_key is not None:
            # keep a random view always on, drop others with p=0.5
            keep = jnp.concatenate(
                [jnp.ones((B, 1, 1, 1)),
                 (jax.random.uniform(dropout_key, (B, V - 1, 1, 1)) > 0.5
                  ).astype(jnp.float32)], axis=1)
            perm_key, _ = jax.random.split(dropout_key)
            perm = jax.random.uniform(perm_key, (B, V, 1, 1))
            order = jnp.argsort(perm, axis=1)
            keep = jnp.take_along_axis(keep, order, axis=1)
            out_mask = out_mask * keep

        # smooth boundary weight
        xyz01 = 0.5 * jnp.concatenate([xy, zn], axis=-1) + 0.5
        dist_b = jnp.minimum(xyz01, 1.0 - xyz01)
        pw = nn.sigmoid(5.0 * (dist_b / 0.1 - 1.0))
        pw = pw[..., 0] * pw[..., 1] * pw[..., 2]
        pw = pw.reshape(B, V, N, 1) * out_mask
        pw = jax.lax.stop_gradient(
            pw / (jnp.sum(pw, axis=1, keepdims=True) + 1e-6))

        feats = []
        for f in feat_geo:
            s = grid_sample_bilinear(f, xy, "border", align_corners=True)
            feats.append(s.reshape(B, V, N, -1))

        # rel_z_decay keypoint encoding in each camera frame
        Rt = cam["extrin"]
        cxyz = jnp.einsum("bij,bnj->bni", Rt[:, :3, :3], v,
                          precision="highest") + Rt[:, :3, 3][:, None]
        kpt = jnp.broadcast_to(kpt3d[:, None], (B, V) + kpt3d.shape[1:]
                               ).reshape(BV, -1, 3)
        kpt_cam = jnp.einsum("bij,bkj->bki", Rt[:, :3, :3], kpt,
                             precision="highest") + Rt[:, :3, 3][:, None]
        y = rel_z_decay_encoding(cxyz, kpt_cam, cfg.sp_level, cfg.sp_scale,
                                 cfg.sp_sigma)
        y = y.reshape(B, V, N, -1)

        out, valid, _, latent_fused = self.mlp_geo(y, feats, out_mask, pw)

        rgb = self._query_color(v, xy, view, V, feat_tex, latent_fused, cam,
                                imgs, out_mask.reshape(BV, N, 1), n_samples)
        return jnp.concatenate([out, rgb], axis=-1), valid

    def _query_color(self, v, xy, view, V, feat_tex, latent_fused, cam,
                     imgs, out_mask, n_samples: int):
        """IBR color head (keypointnerf.py:827-886)."""
        BV, N, _ = v.shape
        B = BV // V
        img_xy = grid_sample_bilinear(imgs, xy, "border", align_corners=True)
        feat_xy = grid_sample_bilinear(feat_tex, xy, "border",
                                       align_corners=True)
        latent = self.ibr_compress_gfeat(latent_fused)  # (B, N, gc)
        latent = jnp.broadcast_to(latent[:, None],
                                  (B, V) + latent.shape[1:]).reshape(BV, N, -1)
        rgb_feat = jnp.concatenate([img_xy, feat_xy, latent], axis=-1)

        inv_krt = jnp.linalg.inv(cam["KRT"])
        cam_pos = inv_krt[:, :3, 3]
        cam_rays = v - cam_pos[:, None]
        cam_rays = cam_rays / jnp.linalg.norm(cam_rays, axis=-1,
                                              keepdims=True)
        view_bv = jnp.broadcast_to(
            view[:, None], (B, V, N, 3)).reshape(BV, N, 3)
        ray_diff = (view_bv - cam_rays).reshape(B, V, N, 3)
        rd_norm = jnp.linalg.norm(ray_diff, axis=-1, keepdims=True)
        rd_dot = jnp.sum(cam_rays * view_bv, axis=-1).reshape(B, V, N, 1)
        ray_diff = jnp.concatenate(
            [ray_diff / jnp.maximum(rd_norm, 1e-6), rd_dot], axis=-1)

        pHW = N // n_samples

        def to_rays(t):
            t = t.reshape(B, V, pHW, n_samples, -1)
            return t.transpose(0, 2, 3, 1, 4).reshape(
                B * pHW, n_samples, V, -1)

        rgb = self.mlp_tex(to_rays(rgb_feat.reshape(B, V, N, -1)),
                           to_rays(ray_diff),
                           to_rays(out_mask.reshape(B, V, N, 1)))
        return rgb.reshape(B, N, 3)

    # ------------------------------------------------------- rendering

    def render_rays(self, ray_o, ray_d, znear_r, zfar_r, cam_in, feat_geo,
                    feat_tex, imgs, kpt3d, src_fg_mask, key, train: bool):
        """Coarse (+ fine) volume rendering of given rays.

        ray_o (B, R, 3), ray_d (B, R, 3) unit, znear_r/zfar_r (B, R, 1).
        Returns dict with color/depth/alpha (+ _fine).
        """
        cfg = self.cfg
        B, R, _ = ray_o.shape
        Sc = cfg.sample_per_ray_c
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)

        t = jnp.linspace(0.0, 1.0, Sc)
        t = jnp.broadcast_to(t, (B, R, Sc))
        if train:
            mid = 0.5 * (t[..., 1:] + t[..., :-1])
            lower = jnp.concatenate([t[..., :1], mid], axis=-1)
            upper = jnp.concatenate([mid, t[..., -1:]], axis=-1)
            t = lower + jax.random.uniform(k1, t.shape) * (upper - lower)
        z = znear_r + (zfar_r - znear_r) * t  # (B, R, Sc)

        def eval_at(zv, n_samples, fine, noise_key):
            S = zv.shape[-1]
            pts = ray_o[:, :, None] + ray_d[:, :, None] * zv[..., None]
            pts = pts.reshape(B, -1, 3)
            view = jnp.broadcast_to(ray_d[:, :, None], (B, R, S, 3)
                                    ).reshape(B, -1, 3)
            rgba, mask = self.query(pts, view, cam_in, feat_geo, feat_tex,
                                    imgs, kpt3d, src_fg_mask, S, train,
                                    dropout_key=k5 if train else None)
            maskf = mask.astype(jnp.float32)
            sdf = maskf * rgba[..., :1] + (1 - maskf) * (0.1 / cfg.nml_scale)
            rad = rgba[..., 1:2]
            rgb = rgba[..., 2:]
            if train and cfg.rand_noise_std > 0:
                rad = rad + jax.random.normal(noise_key, rad.shape) \
                    * cfg.rand_noise_std
            alpha = maskf * jax.nn.relu(rad)
            out = jnp.concatenate([alpha, sdf, rgb], axis=-1)
            return out.reshape(B, R, S, -1)

        rgba_c = eval_at(z, Sc, False, k2)
        color, depth, alpha, contrib, sdf = rgba2out(rgba_c, z)
        out = {"color": color, "depth": depth, "alpha": alpha}

        if cfg.fine:
            z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
            z_fine = importance_sample(contrib[..., 1:-1], z_mid,
                                       cfg.sample_per_ray_f,
                                       key=k3, uniform=not train)
            z_all = jnp.sort(jnp.concatenate([z, z_fine], axis=-1), axis=-1)
            rgba_f = eval_at(z_all, z_all.shape[-1], True, k4)
            color_f, depth_f, alpha_f, _, sdf_f = rgba2out(rgba_f, z_all)
            out.update({"color_fine": color_f, "depth_fine": depth_f,
                        "alpha_fine": alpha_f, "sdf": sdf_f})
        return out


def rgba2out(rgba, z):
    """Composite [alpha-density, sdf, rgb] samples (keypointnerf.py:1205-1231).

    rgba (B, R, S, 5), z (B, R, S) sorted. Returns (color, depth, alpha,
    contrib, sdf)."""
    alpha = rgba[..., 0]
    sdf = rgba[..., 1]
    rgb = rgba[..., 2:]
    dist = jnp.concatenate(
        [z[..., 1:] - z[..., :-1], 1e10 * jnp.ones_like(z[..., :1])], axis=-1)
    contrib = 1.0 - jnp.exp(-alpha * dist)
    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones_like(contrib[..., :1]), 1 - contrib[..., :-1]], axis=-1),
        axis=-1)
    contrib = contrib * trans
    color = jnp.sum(rgb * contrib[..., None], axis=-2)
    acc = jnp.sum(contrib, axis=-1)
    sdf_out = jnp.sum(sdf * contrib, axis=-1) / (acc + 1e-8)
    depth = jnp.sum(z * contrib, axis=-1) / (acc + 1e-8)
    return color, depth, acc, contrib, sdf_out


def importance_sample(contrib, z, n: int, key, uniform: bool = False):
    """Inverse-CDF resampling of ray contributions
    (keypointnerf.py:1165-1203). contrib (B, R, D-2), z (B, R, D-1)."""
    contrib = jax.lax.stop_gradient(contrib) + 1e-5
    pdf = contrib / jnp.sum(contrib, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if uniform:
        sample = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n),
                                  cdf.shape[:-1] + (n,))
    else:
        sample = jax.random.uniform(key, cdf.shape[:-1] + (n,))

    idx = _batched_searchsorted(cdf, sample)
    idx_prev = jnp.clip(idx - 1, 0, None)
    idx = jnp.clip(idx, None, cdf.shape[-1] - 1)

    cdf_prev = jnp.take_along_axis(cdf, idx_prev, axis=-1)
    cdf_next = jnp.take_along_axis(cdf, idx, axis=-1)
    z_prev = jnp.take_along_axis(z, jnp.clip(idx_prev, 0, z.shape[-1] - 1),
                                 axis=-1)
    z_next = jnp.take_along_axis(z, jnp.clip(idx, 0, z.shape[-1] - 1),
                                 axis=-1)
    den = cdf_next - cdf_prev
    den = jnp.where(den < 1e-5, jnp.ones_like(den), den)
    return z_prev + (sample - cdf_prev) / den * (z_next - z_prev)


def _batched_searchsorted(cdf, sample):
    """searchsorted(right) along the last axis for batched inputs."""
    return jnp.sum(sample[..., None] >= cdf[..., None, :], axis=-1)


def ray_bbox_intersection(bounds, orig, direct, boffset=(-0.01, 0.01)):
    """Ray–AABB clipping (keypointnerf.py:1233-1290), masked math.

    bounds (B, 2, 3); orig (B, 1, 3); direct (B, R, 3).
    Returns (near (B, R, 1), far (B, R, 1), hit (B, R, 1)); near/far are 1.0
    where the ray misses (the reference's fill value).
    """
    b = bounds + jnp.asarray(boffset)[None, :, None]
    d = jnp.where(jnp.abs(direct) < 1e-5, 1e-5, direct)
    tt = (b[:, None] - orig[:, :, None]) / d[:, :, None]  # (B, R, 2, 3)
    B, R = d.shape[:2]
    t6 = tt.reshape(B, R, 6)
    p = t6[..., None] * d[:, :, None] + orig  # (B, R, 6, 3)
    lo = b[:, 0][:, None, None]
    hi = b[:, 1][:, None, None]
    eps = 1e-6
    inside = jnp.all((p >= lo - eps) & (p <= hi + eps), axis=-1)  # (B, R, 6)
    hit = jnp.sum(inside, axis=-1) == 2
    tabs = jnp.abs(t6)
    near = jnp.min(jnp.where(inside, tabs, jnp.inf), axis=-1)
    far = jnp.max(jnp.where(inside, tabs, -jnp.inf), axis=-1)
    near = jnp.where(hit, near, 1.0)[..., None]
    far = jnp.where(hit, far, 1.0)[..., None]
    return near, far, hit[..., None]
