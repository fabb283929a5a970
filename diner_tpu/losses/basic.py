"""Pixel-space losses.

Parity targets: MSE ray loss (``src/models/diner.py:61, 267``) and the
antibias loss — 2^n average-pool downsampling followed by L1, penalizing
low-frequency color shift (``src/losses/antibiasloss.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def antibias_loss(pred, target, n_downsampling: int = 3):
    """pred/target: (N, H, W, 3); 2**n_downsampling-fold avg-pool then L1."""
    k = 2 ** n_downsampling
    p = nn.avg_pool(pred, (k, k), strides=(k, k))
    t = nn.avg_pool(target, (k, k), strides=(k, k))
    return l1_loss(p, t)
