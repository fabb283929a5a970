"""Conv building blocks for the MVS subsystem (flax, channels-last).

Parity targets: reference ``deps/TransMVSNet/models/module.py`` Conv2d /
Deconv2d / Conv3d / Deconv3d wrappers (conv + BatchNorm(momentum 0.1) +
ReLU; deconvs are stride-2 transposed convs cropped to exactly 2× the input
size).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _norm(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class ConvBnReLU(nn.Module):
    """2-D conv (+BN, +ReLU). Input (N, H, W, C)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None
    bn: bool = True
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.padding if self.padding is not None else self.kernel // 2
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=[(pad, pad)] * 2, use_bias=not self.bn,
                    dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = _norm(train, self.dtype, "bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvBnReLU3D(nn.Module):
    """3-D conv (+BN, +ReLU). Input (N, D, H, W, C)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None
    bn: bool = True
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = self.padding if self.padding is not None else self.kernel // 2
        x = nn.Conv(self.features, (self.kernel,) * 3,
                    strides=(self.stride,) * 3,
                    padding=[(pad, pad)] * 3, use_bias=not self.bn,
                    dtype=self.dtype, name="conv")(x)
        if self.bn:
            x = _norm(train, self.dtype, "bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DeconvBnReLU3D(nn.Module):
    """Stride-2 3-D transposed conv (+BN, +ReLU), output exactly 2× input.

    torch's ConvTranspose3d(k=3, s=2, p=1, output_padding=1) ≡ flax
    ConvTranspose with padding chosen so out = 2·in; we crop to 2× like the
    reference's Deconv wrappers do.
    """

    features: int
    kernel: int = 3
    bn: bool = True
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        import jax

        # transpose conv as zero-interleave (lax.pad interior) + VALID conv:
        # exactly torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1)
        # with the kernel spatially flipped (handled by the weight converter)
        pad_cfg = [(0, 0, 0)] + [(1, 2, 1)] * 3 + [(0, 0, 0)]
        z = jax.lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
        y = nn.Conv(self.features, (self.kernel,) * 3, padding="VALID",
                    use_bias=not self.bn, dtype=self.dtype, name="conv")(z)
        if self.bn:
            y = _norm(train, self.dtype, "bn")(y)
        if self.relu:
            y = nn.relu(y)
        return y
