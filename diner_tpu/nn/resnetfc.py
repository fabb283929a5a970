"""Residual fully-connected NeRF MLP (flax).

Parity target: reference ``src/models/resnetfc.py`` — 5 residual FC blocks
of width ``d_hidden``, latent injected additively via per-block ``lin_z``
before ``combine_layer``, mean-fusion across source views at that layer,
kaiming-fan-in init with zero-initialized residual output layers.

This MLP is where the rendering FLOPs live: (SB·NV·B, 512)×(512, 512)
matmuls land directly on the MXU; keep B (= rays × samples per chunk) a
multiple of 128 for full tiling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import constant, variance_scaling, zeros

# torch kaiming_normal_(a=0, mode="fan_in") on a ReLU net == He normal fan-in
_kaiming = variance_scaling(2.0, "fan_in", "truncated_normal")
_kaiming_exact = variance_scaling(2.0, "fan_in", "normal")


class ResnetBlockFC(nn.Module):
    """One residual FC block: x + fc1(act(fc0(act(x))))."""

    size_h: int
    size_out: int | None = None
    beta: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        size_out = self.size_out or x.shape[-1]
        act = (lambda t: nn.softplus(self.beta * t) / self.beta) \
            if self.beta > 0 else nn.relu
        net = nn.Dense(self.size_h, kernel_init=_kaiming_exact,
                       bias_init=constant(0.0), dtype=self.dtype,
                       name="fc_0")(act(x))
        dx = nn.Dense(size_out, kernel_init=zeros,
                      bias_init=constant(0.0), dtype=self.dtype,
                      name="fc_1")(act(net))
        if x.shape[-1] != size_out:
            x = nn.Dense(size_out, use_bias=False,
                         kernel_init=_kaiming_exact, dtype=self.dtype,
                         name="shortcut")(x)
        return x + dx


class ResnetFC(nn.Module):
    """The conditioned NeRF MLP.

    Input layout along the last axis is ``[latent (d_latent), x (d_in)]``,
    matching the reference. ``combine_axis`` is the axis reduced (mean) at
    ``combine_layer`` — for DINER this is the source-view axis.
    """

    d_in: int
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    combine_axis: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, zx):
        assert zx.shape[-1] == self.d_latent + self.d_in
        act = (lambda t: nn.softplus(self.beta * t) / self.beta) \
            if self.beta > 0 else nn.relu

        if self.d_latent > 0:
            z = zx[..., : self.d_latent]
            x = zx[..., self.d_latent:]
        else:
            z = None
            x = zx
        x = nn.Dense(self.d_hidden, kernel_init=_kaiming_exact,
                     bias_init=constant(0.0), dtype=self.dtype,
                     name="lin_in")(x)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = jnp.mean(x, axis=self.combine_axis)
            if z is not None and blkid < self.combine_layer:
                tz = nn.Dense(self.d_hidden, kernel_init=_kaiming_exact,
                              bias_init=constant(0.0), dtype=self.dtype,
                              name=f"lin_z_{blkid}")(z)
                x = x + tz
            x = ResnetBlockFC(size_h=self.d_hidden, beta=self.beta,
                              dtype=self.dtype, name=f"block_{blkid}")(x)

        return nn.Dense(self.d_out, kernel_init=_kaiming_exact,
                        bias_init=constant(0.0), dtype=self.dtype,
                        name="lin_out")(act(x))
