"""NOVEL / NOVEL_PE — expression-deformation PixelNeRF variants (flax).

Parity targets:
  - ``src/models/novel/novel_pixelnerf.py`` — PixelNeRF plus a learnable
    latent plane ``gen_latent (512, 192, 192)`` sampled at the projected uv
    of a canonical "general" camera, added to the CNN latent (:46-47,
    :108-133, :143-245); field takes (xyz, gen_xyz, viewdirs).
  - ``src/models/novel_pe/pe_novel_pixelnerf.py`` — additionally indexes
    precomputed per-view positional-encoding maps for source and target
    expressions; a linear ``deformation_layer`` maps the (latent+6)-channel
    conditioned latent back to latent width (:21-28, :200-270).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from diner_tpu.geometry.transforms import (
    project_points,
    rotate_to_cam,
    uv_to_ndc,
    world_to_cam,
)
from diner_tpu.models.pixelnerf import PixelNeRFConfig
from diner_tpu.models.scene import SceneContext, index_latent
from diner_tpu.nn.resnetfc import ResnetFC
from diner_tpu.nn.spatial_encoder import SpatialEncoder, normalize_imagenet
from diner_tpu.ops.grid_sample import grid_sample_bilinear, grid_sample_nearest


@flax.struct.dataclass
class GenContext:
    """Canonical "general" camera (encode_gen, novel_pixelnerf.py:76-83),
    plus optional PE maps for the NOVEL_PE variant."""

    poses: jax.Array       # (SB, 1, 4, 4)
    focal: jax.Array       # (SB, 1, 2)
    c: jax.Array           # (SB, 1, 2)
    image_wh: jax.Array    # (2,)
    # NOVEL_PE extras (None for plain NOVEL)
    src_pe_maps: Optional[jax.Array] = None  # (SB, NV, H, W, 3)
    tgt_pe_map: Optional[jax.Array] = None   # (SB, 1, H, W, 3)


@dataclass(frozen=True)
class NovelPixelNeRFConfig(PixelNeRFConfig):
    gen_latent_hw: int = 192
    gen_latent_ch: int = 512
    use_pe_maps: bool = False  # NOVEL_PE variant

    @property
    def d_latent(self) -> int:
        # NOVEL_PE: latent + src/tgt PE (3+3) before the deformation layer
        return self.encoder.latent_size


class NovelPixelNeRF(nn.Module):
    cfg: NovelPixelNeRFConfig = NovelPixelNeRFConfig()

    @property
    def dtype(self):
        return (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                else jnp.float32)

    def setup(self):
        cfg = self.cfg
        self.encoder = SpatialEncoder(cfg=cfg.encoder, dtype=self.dtype)
        self.mlp = ResnetFC(
            d_in=cfg.d_in, d_out=4, n_blocks=cfg.n_blocks,
            d_latent=cfg.d_latent, d_hidden=cfg.d_hidden,
            beta=cfg.mlp_beta, combine_layer=cfg.combine_layer,
            combine_axis=1, dtype=self.dtype)
        # learnable latent plane, stored channels-last (H, W, C)
        self.gen_latent = self.param(
            "gen_latent", nn.initializers.normal(1.0),
            (cfg.gen_latent_hw, cfg.gen_latent_hw, cfg.gen_latent_ch))
        if cfg.use_pe_maps:
            self.deformation_layer = nn.Dense(cfg.d_latent,
                                              dtype=self.dtype)

    def encode(self, images, depths, depths_std, extrinsics, intrinsics,
               train: bool = True) -> SceneContext:
        from diner_tpu.geometry.normals import depth_to_normal

        SB, NV, H, W, _ = images.shape
        imgs = normalize_imagenet(images)
        normals = depth_to_normal(
            depths.reshape(SB * NV, H, W),
            intrinsics.reshape(SB * NV, 3, 3)).reshape(SB, NV, H, W, 3)
        latent = self.encoder(imgs.reshape(SB * NV, H, W, 3), train=train)
        latent = latent.reshape((SB, NV) + latent.shape[1:])
        intrinsics = jnp.asarray(intrinsics)  # accept host numpy
        focal = intrinsics[:, :, jnp.array([0, 1]), jnp.array([0, 1])]
        c = intrinsics[:, :, :2, 2]
        return SceneContext(
            latent=latent, depths=depths, depth_stds=depths_std,
            normals=normals, poses=extrinsics, focal=focal, c=c,
            image_wh=jnp.asarray([float(W), float(H)], imgs.dtype),
            feature_padding=self.cfg.encoder.feature_padding)

    def index_gen_latent(self, uv_ndc):
        """Sample the learnable plane at normalized uv with the same
        feature-padding rescale the CNN latent uses
        (novel_pixelnerf.py:108-141)."""
        SB, NV, P, _ = uv_ndc.shape
        Hl = Wl = self.cfg.gen_latent_hw
        fp = self.cfg.encoder.feature_padding
        scale = jnp.asarray([(Wl - 2.0 * fp) / Wl, (Hl - 2.0 * fp) / Hl],
                            uv_ndc.dtype)
        uv = (uv_ndc * scale).reshape(SB * NV, P, 2)
        plane = jnp.broadcast_to(self.gen_latent[None],
                                 (SB * NV,) + self.gen_latent.shape)
        out = grid_sample_bilinear(plane, uv, "border")
        return out.reshape(SB, NV, P, -1)

    def field(self, ctx: SceneContext, gen: GenContext, xyz, gen_xyz,
              viewdirs):
        """Radiance at observation-space points `xyz`, latent-plane lookup at
        canonical points `gen_xyz` (novel_pixelnerf.py:143-245)."""
        cfg = self.cfg
        SB, B, _ = xyz.shape
        NV = ctx.num_views

        xyz_cam = world_to_cam(xyz, ctx.poses)
        dirs_cam = rotate_to_cam(viewdirs, ctx.poses)
        z_feature = cfg.poscode(xyz_cam)
        z_feature = jnp.concatenate([z_feature, dirs_cam], axis=-1)

        uv = uv_to_ndc(project_points(xyz_cam, ctx.focal, ctx.c),
                       ctx.image_wh)
        latent = index_latent(ctx, uv)

        gen_cam = world_to_cam(gen_xyz, gen.poses)  # (SB, 1, B, 3)
        gen_uv = uv_to_ndc(project_points(gen_cam, gen.focal, gen.c),
                           gen.image_wh)
        gen_uv = jnp.broadcast_to(gen_uv, (SB, NV, B, 2))
        gen_latent = self.index_gen_latent(gen_uv)

        if cfg.use_pe_maps:
            src_pe = index_latent(
                ctx.replace(latent=gen.src_pe_maps), uv)
            tgt_pe_maps = jnp.broadcast_to(
                gen.tgt_pe_map, (SB, NV) + gen.tgt_pe_map.shape[2:])
            tgt_pe = index_latent(
                ctx.replace(latent=tgt_pe_maps), uv)
            conditioned = jnp.concatenate([latent, src_pe, tgt_pe], axis=-1)
            latent = self.deformation_layer(conditioned)

        final_latent = gen_latent + latent

        ref_depth = grid_sample_nearest(
            ctx.depths.reshape((SB * NV,) + ctx.depths.shape[2:]),
            uv.reshape(SB * NV, B, 2), "border").reshape(SB, NV, B)
        depth_dist = ref_depth - xyz_cam[..., 2]
        depth_feature = cfg.depthcode(depth_dist[..., None])

        mlp_in = jnp.concatenate([final_latent, z_feature, depth_feature],
                                 axis=-1)
        out = self.mlp(mlp_in).astype(jnp.float32)
        rgb = jax.nn.sigmoid(out[..., :3])
        sigma = jax.nn.relu(out[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1)

    def __call__(self, images, depths, depths_std, extrinsics, intrinsics,
                 gen: GenContext, xyz, gen_xyz, viewdirs):
        ctx = self.encode(images, depths, depths_std, extrinsics, intrinsics)
        return self.field(ctx, gen, xyz, gen_xyz, viewdirs)


def make_gen_context(gen_extrinsics, gen_intrinsics, image_wh,
                     src_pe_maps=None, tgt_pe_map=None) -> GenContext:
    """Pack the canonical camera (encode_gen, novel_pixelnerf.py:76-83)."""
    gen_intrinsics = jnp.asarray(gen_intrinsics)  # accept host numpy
    focal = gen_intrinsics[:, jnp.array([0, 1]), jnp.array([0, 1])][:, None]
    c = gen_intrinsics[:, :2, 2][:, None]
    return GenContext(
        poses=gen_extrinsics[:, None], focal=focal, c=c,
        image_wh=jnp.asarray(image_wh, jnp.float32),
        src_pe_maps=src_pe_maps, tgt_pe_map=tgt_pe_map)
