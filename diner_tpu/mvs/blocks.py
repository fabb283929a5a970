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


class TapConvIn1(nn.Module):
    """3-D conv with C_in = 1 taking a CHANNEL-FREE (B, D, H, W) volume.

    Numerically identical to ``nn.Conv(F, (k,k,k))`` on ``x[..., None]``
    and stores the identical param schema (kernel (k,k,k,1,F) under the
    same name), but never materializes a trailing-singleton tensor: on TPU
    a (…, 1) minor dim is lane-padded ×128+ (measured 1.25 GB on a 5 MB
    cost volume — the peak of the full-res MVS training graph). Computed
    as a k³-tap weighted sum of shifted volumes (one XLA fusion).
    """

    features: int
    kernel: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        pad = k // 2
        B, D, H, W = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, k, 1, self.features))
        wk = w[..., 0, :].astype(self.dtype)  # (k, k, k, F)
        x = x.astype(self.dtype)
        xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (pad, pad)])
        # accumulate the k^3 taps in f32 (nn.Conv accumulates f32 inside
        # the conv op; a bf16-running-sum of 27 terms diverges) and cast
        # once — the accumulator is the small F-channel output tensor.
        out = None
        for dz in range(k):
            for dy in range(k):
                for dx in range(k):
                    term = (xp[:, dz:dz + D, dy:dy + H,
                               dx:dx + W][..., None]
                            * wk[dz, dy, dx]).astype(jnp.float32)
                    out = term if out is None else out + term
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out.astype(self.dtype)


class TapConvOut1(nn.Module):
    """3-D conv with C_out = 1 returning a CHANNEL-FREE (B, D, H, W) map.

    Same param schema as ``nn.Conv(1, (k,k,k))`` (kernel (k,k,k,C,1) [+
    bias (1,)]); avoids the (…, 1)-singleton output/cotangent tensors
    (×128+ TPU lane padding). Used for CostRegNet's ``prob`` head and
    PixelwiseNet's final 1×1×1 conv.
    """

    kernel: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h):
        k = self.kernel
        pad = k // 2
        B, D, H, W, C = h.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, k, C, 1))
        wk = w[..., 0].astype(self.dtype)  # (k, k, k, C)
        hp = jnp.pad(h, [(0, 0), (pad, pad), (pad, pad), (pad, pad),
                         (0, 0)]) if pad else h
        out = None
        # f32 tap accumulation, cast once (see TapConvIn1)
        for dz in range(k):
            for dy in range(k):
                for dx in range(k):
                    term = jnp.sum(
                        (hp[:, dz:dz + D, dy:dy + H, dx:dx + W]
                         * wk[dz, dy, dx]).astype(jnp.float32), axis=-1)
                    out = term if out is None else out + term
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (1,))
            out = out + b[0].astype(out.dtype)
        return out.astype(self.dtype)


class ConvBnReLU3D(nn.Module):
    """3-D conv (+BN, +ReLU). Input (N, D, H, W, C), or a channel-free
    (N, D, H, W) volume (C_in = 1 without the singleton — see TapConvIn1)."""

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
        if x.ndim == 4:
            assert self.stride == 1 and pad == self.kernel // 2
            x = TapConvIn1(self.features, self.kernel,
                           use_bias=not self.bn, dtype=self.dtype,
                           name="conv")(x)
        else:
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
