"""Pixel-aligned spatial image encoder (flax).

Parity target: reference ``src/models/image_encoder.py`` (SpatialEncoder):
  - input replication-padded by ``image_padding`` px with a 2-D
    positional-encoding stamp on the padded ring (zeroed inside the image),
    concatenated as extra input channels (:224-232);
  - truncated ResNet34 feature pyramid, every level bilinearly upsampled
    (align_corners=True) to conv1 resolution and channel-concatenated
    (:246-272) → 512-channel latent at half the padded-image resolution.

Layout is NHWC throughout (TPU-native); the latent is returned as
(SB, NV, H_lat, W_lat, C).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from diner_tpu.nn.positional_encoding import PositionalEncoding
from diner_tpu.nn.resnet import ResNetEncoder
from diner_tpu.utils.resize import resize_bilinear_align_corners

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class SpatialEncoderConfig:
    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    image_padding: int = 64
    padding_pe: int = 4  # num_freqs of the ring PE; < 0 disables

    @property
    def latent_size(self) -> int:
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @property
    def feature_padding(self) -> int:
        # conv1 has stride 2; the latent canvas keeps half the image padding
        assert self.image_padding % 2 == 0
        return self.image_padding // 2


def pad_ring_pe(H: int, W: int, padding: int, num_freqs: int, dtype=jnp.float32):
    """The positional-encoding stamp for the padded ring.

    Returns (H + 2p, W + 2p, d_pe) with zeros strictly inside the image
    region, matching ``image_encoder.py:226-231``.
    """
    pe = PositionalEncoding(num_freqs=num_freqs, d_in=2,
                            freq_factor=math.pi, include_input=True)
    ys = jnp.linspace(-1.0, 1.0, H + 2 * padding, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, W + 2 * padding, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (H+2p, W+2p)
    grid = jnp.stack([gx, gy], axis=-1)
    stamp = pe(grid)
    mask = jnp.zeros((H + 2 * padding, W + 2 * padding, 1), dtype=dtype)
    mask = mask.at[padding:-padding, padding:-padding].set(1.0) if padding > 0 \
        else mask + 1.0
    return stamp * (1.0 - mask) if padding > 0 else jnp.zeros_like(stamp)


class SpatialEncoder(nn.Module):
    """images (N, H, W, 3), ImageNet-normalized by the caller → latent."""

    cfg: SpatialEncoderConfig = SpatialEncoderConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, train: bool = True):
        cfg = self.cfg
        N, H, W, _ = imgs.shape
        p = cfg.image_padding

        if p > 0:
            imgs = jnp.pad(imgs, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        if cfg.padding_pe >= 0 and cfg.feature_padding > 0:
            stamp = pad_ring_pe(H, W, p, cfg.padding_pe, dtype=imgs.dtype)
            imgs = jnp.concatenate(
                [imgs, jnp.broadcast_to(stamp[None], (N,) + stamp.shape)],
                axis=-1,
            )

        latents = ResNetEncoder(
            backbone=cfg.backbone, num_layers=cfg.num_layers,
            use_first_pool=cfg.use_first_pool, dtype=self.dtype,
            name="resnet")(imgs, train=train)

        out_h, out_w = latents[0].shape[1:3]
        latents = [resize_bilinear_align_corners(t, out_h, out_w)
                   for t in latents]
        return jnp.concatenate(latents, axis=-1)  # (N, H_lat, W_lat, C)


def normalize_imagenet(rgb):
    """ImageNet normalization of (..., 3) RGB in [0, 1]."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=rgb.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=rgb.dtype)
    return (rgb - mean) / std
