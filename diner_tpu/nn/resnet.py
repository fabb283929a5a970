"""ResNet-18/34 feature-pyramid encoder (flax, NHWC).

Structural parity with the torchvision backbone the reference uses
(``src/models/image_encoder.py:50-56``): conv1 7×7/2 → BN → ReLU →
maxpool 3×3/2 → basic-block stages [64, 128, 256, 512]. BatchNorm runs in
*batch-stats* mode during training (the reference trains encoder BN and DDP
never synchronizes it, so per-device batch stats are the faithful
semantics); inference uses the running averages.

``ResNetEncoder.__call__`` returns the multi-scale latent list
``[conv1_out, layer1, ..., layer{num_layers-1}]`` used by the spatial
encoder. A converter for torchvision state_dicts lives in
``diner_tpu.utils.torch_convert``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

STAGE_BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
STAGE_WIDTHS = (64, 128, 256, 512)


class BasicBlock(nn.Module):
    """conv3×3-BN-ReLU-conv3×3-BN + identity/downsample skip, ReLU after add."""

    width: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # BN statistics/normalization stay in f32 even under bf16 compute,
        # but the OUTPUT is cast back to the compute dtype: otherwise flax's
        # f32 BN silently promotes every activation after it (residual adds,
        # the whole feature pyramid, and downstream consumers like the
        # 512-channel latent gather) to f32 — 2x the HBM traffic of the
        # intended mixed-precision recipe.
        norm = lambda name: (lambda t: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)(t).astype(self.dtype))
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.width, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.width:
            x = nn.Conv(self.width, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = norm("downsample_bn")(x)
        return nn.relu(x + y)


class ResNetEncoder(nn.Module):
    """Truncated ResNet returning the feature pyramid.

    Args (module attributes):
      backbone: "resnet34" | "resnet18".
      num_layers: how many pyramid levels to return (1 = conv1 only, ...,
        5 = through layer4). DINER uses 4 → latent channels 64+64+128+256.
      use_first_pool: apply the stride-2 maxpool before layer1.
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @nn.compact
    def __call__(self, x, train: bool = True) -> Sequence[jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.backbone]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         name="bn1")(x).astype(self.dtype)
        x = nn.relu(x)

        latents = [x]
        for stage in range(4):
            if self.num_layers <= stage + 1:
                break
            if stage == 0 and self.use_first_pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            for blk in range(blocks[stage]):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = BasicBlock(width=STAGE_WIDTHS[stage], stride=stride,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{blk}")(x, train)
            latents.append(x)
        return latents
