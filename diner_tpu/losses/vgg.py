"""VGG19 perceptual loss (flax).

Parity target: reference ``src/losses/vggloss.py`` — four feature slices of
torchvision vgg19.features (cut after ReLU indices 1, 6, 11, 20), L1 per
slice with weights [1/16, 1/8, 1/4, 1], inputs ImageNet-normalized, target
features detached.

Weights: load a torchvision vgg19 ``features.*`` state_dict via
``diner_tpu.utils.torch_convert.convert_vgg19_features``; without pretrained
weights, :func:`init_vgg19_params` gives a fixed-seed random backbone (still
a usable multi-scale feature metric — documented deviation, since this
environment cannot download torchvision weights).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from diner_tpu.nn.spatial_encoder import normalize_imagenet

# (torch layer index, out_channels); maxpool positions implied by index gaps
_VGG19_CONVS = ((0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256),
                (14, 256), (16, 256), (19, 512))
_POOL_BEFORE = {5, 10, 19}  # conv indices preceded by a 2x2 maxpool
_SLICE_ENDS = {2: 0, 7: 1, 12: 2}  # conv index at which a slice boundary sits


class VGG19Features(nn.Module):
    """Returns the four reference feature slices for (N, H, W, 3) input."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jax.Array]:
        feats = []
        for idx, ch in _VGG19_CONVS:
            if idx in _POOL_BEFORE:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if idx in _SLICE_ENDS:
                feats.append(x)
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv_{idx}")(x)
            x = nn.relu(x)
        feats.append(x)  # after relu of conv_19
        return feats


def init_vgg19_params(seed: int = 0):
    """Fixed-seed random VGG19 params (fallback when no pretrained weights)."""
    model = VGG19Features()
    return model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 64, 64, 3)))["params"]


SLICE_WEIGHTS = (1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(vgg_params, pred, target, dtype=jnp.float32):
    """Perceptual L1 between feature slices.

    Args:
      vgg_params: VGG19Features params (frozen; pass through
        ``jax.lax.stop_gradient`` upstream if they live in the train state).
      pred, target: (N, H, W, 3) RGB in [0, 1].
      dtype: conv compute dtype — pass bf16 to run the frozen perceptual
        net in mixed precision (per-slice means still reduce in f32).
    """
    model = VGG19Features(dtype=dtype)
    fx = model.apply({"params": vgg_params},
                     normalize_imagenet(pred).astype(dtype))
    fy = model.apply({"params": vgg_params},
                     normalize_imagenet(target).astype(dtype))
    loss = 0.0
    for w, a, b in zip(SLICE_WEIGHTS, fx, fy):
        diff = jnp.abs(a.astype(jnp.float32)
                       - jax.lax.stop_gradient(b).astype(jnp.float32))
        loss = loss + w * jnp.mean(diff)
    return loss
