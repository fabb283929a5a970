"""PixelNeRF — the conditioned radiance field (flax).

Parity target: reference ``src/models/pixelnerf.py``:
  - ``encode``: ImageNet-normalize source RGB, depth→normal, run the spatial
    encoder, stash camera parameters (:35-53). Here encode returns an
    explicit :class:`SceneContext` instead of mutating buffers.
  - ``forward`` (here ``field``): per-source-view camera transform,
    positional encoding of camera-space xyz + rotated viewdirs, perspective
    projection, pixel-aligned latent + depth-distance feature, ResnetFC with
    mean view-fusion at the combine layer, sigmoid(rgb)/relu(sigma) (:55-145).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from diner_tpu.geometry.normals import depth_to_normal
from diner_tpu.geometry.transforms import (
    world_to_cam,
    rotate_to_cam,
    project_points,
    uv_to_ndc,
)
from diner_tpu.nn.positional_encoding import PositionalEncoding
from diner_tpu.nn.resnetfc import ResnetFC
from diner_tpu.nn.spatial_encoder import (
    SpatialEncoder,
    SpatialEncoderConfig,
    normalize_imagenet,
)
from diner_tpu.models.scene import SceneContext, index_latent
from diner_tpu.ops.grid_sample import grid_sample_nearest


@dataclass(frozen=True)
class PixelNeRFConfig:
    # positional encoding (shared settings for pos & depth codes, like the
    # reference's poscode_conf driving both)
    num_freqs: int = 6
    freq_factor: float = 6.28
    include_input: bool = True
    # encoder
    encoder: SpatialEncoderConfig = dc_field(default_factory=SpatialEncoderConfig)
    # MLP
    n_blocks: int = 5
    d_hidden: int = 512
    combine_layer: int = 3
    mlp_beta: float = 0.0
    # activation/matmul dtype ("float32" | "bfloat16"); params stay f32
    compute_dtype: str = "float32"

    @property
    def poscode(self) -> PositionalEncoding:
        return PositionalEncoding(self.num_freqs, 3, self.freq_factor,
                                  self.include_input)

    @property
    def depthcode(self) -> PositionalEncoding:
        return PositionalEncoding(self.num_freqs, 1, self.freq_factor,
                                  self.include_input)

    @property
    def d_in(self) -> int:
        return self.poscode.d_out + self.depthcode.d_out + 3

    @property
    def d_latent(self) -> int:
        return self.encoder.latent_size


class PixelNeRF(nn.Module):
    """Use with ``method='encode'`` to build a SceneContext and
    ``method='field'`` to query radiance at world points."""

    cfg: PixelNeRFConfig = PixelNeRFConfig()

    @property
    def dtype(self):
        return (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                else jnp.float32)

    def setup(self):
        self.encoder = SpatialEncoder(cfg=self.cfg.encoder, dtype=self.dtype)
        self.mlp = ResnetFC(
            d_in=self.cfg.d_in,
            d_out=4,
            n_blocks=self.cfg.n_blocks,
            d_latent=self.cfg.d_latent,
            d_hidden=self.cfg.d_hidden,
            beta=self.cfg.mlp_beta,
            combine_layer=self.cfg.combine_layer,
            combine_axis=1,
            dtype=self.dtype,
        )

    def encode(self, images, depths, depths_std, extrinsics, intrinsics,
               train: bool = True) -> SceneContext:
        """Build the SceneContext from posed source views.

        Args:
          images: (SB, NV, H, W, 3) RGB in [0, 1].
          depths / depths_std: (SB, NV, H, W, 1).
          extrinsics: (SB, NV, 4, 4); intrinsics: (SB, NV, 3, 3).
        """
        SB, NV, H, W, _ = images.shape
        imgs = normalize_imagenet(images)
        normals = depth_to_normal(
            depths.reshape(SB * NV, H, W),
            intrinsics.reshape(SB * NV, 3, 3),
        ).reshape(SB, NV, H, W, 3)

        latent = self.encoder(imgs.reshape(SB * NV, H, W, 3), train=train)
        latent = latent.reshape((SB, NV) + latent.shape[1:])

        intrinsics = jnp.asarray(intrinsics)  # accept host numpy
        focal = intrinsics[:, :, jnp.array([0, 1]), jnp.array([0, 1])]
        c = intrinsics[:, :, :2, 2]
        return SceneContext(
            latent=latent,
            depths=depths,
            depth_stds=depths_std,
            normals=normals,
            poses=extrinsics,
            focal=focal,
            c=c,
            image_wh=jnp.asarray([float(W), float(H)], dtype=imgs.dtype),
            feature_padding=self.cfg.encoder.feature_padding,
        )

    def field(self, ctx: SceneContext, xyz, viewdirs):
        """Radiance at world points.

        Args:
          ctx: SceneContext from :meth:`encode`.
          xyz: (SB, B, 3) world points; viewdirs: (SB, B, 3).

        Returns:
          (SB, B, 4) = [sigmoid(rgb), relu(sigma)].
        """
        cfg = self.cfg
        SB, B, _ = xyz.shape
        NV = ctx.num_views

        xyz_cam = world_to_cam(xyz, ctx.poses)          # (SB, NV, B, 3)
        dirs_cam = rotate_to_cam(viewdirs, ctx.poses)   # (SB, NV, B, 3)

        z_feature = cfg.poscode(xyz_cam)                # (SB, NV, B, 39)
        z_feature = jnp.concatenate([z_feature, dirs_cam], axis=-1)

        uv = uv_to_ndc(project_points(xyz_cam, ctx.focal, ctx.c), ctx.image_wh)
        latent = index_latent(ctx, uv)                  # (SB, NV, B, C)

        ref_depth = grid_sample_nearest(
            ctx.depths.reshape((SB * NV,) + ctx.depths.shape[2:]),
            uv.reshape(SB * NV, B, 2), "border",
        ).reshape(SB, NV, B)
        depth_dist = ref_depth - xyz_cam[..., 2]
        depth_feature = cfg.depthcode(depth_dist[..., None])  # (SB, NV, B, 13)

        mlp_in = jnp.concatenate([latent, z_feature, depth_feature], axis=-1)
        out = self.mlp(mlp_in)                          # (SB, B, 4)

        out = out.astype(jnp.float32)  # composite/losses stay f32
        rgb = jax.nn.sigmoid(out[..., :3])
        sigma = jax.nn.relu(out[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1)

    def __call__(self, images, depths, depths_std, extrinsics, intrinsics,
                 xyz, viewdirs):
        """Init-friendly entry exercising both methods."""
        ctx = self.encode(images, depths, depths_std, extrinsics, intrinsics)
        return self.field(ctx, xyz, viewdirs)
