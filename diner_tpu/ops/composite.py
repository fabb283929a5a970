"""Alpha-compositing volume integration.

Parity target: reference ``src/models/nerf_renderer.py:286-365`` —
deltas with +∞ tail to ``far``, α = 1 − exp(−δ·relu(σ)), transmittance
cumprod with the 1e-10 floor, weighted rgb/depth sums, optional white
background via residual alpha.

Decomposed functionally: the field is evaluated by the renderer; this op
takes (rgb, sigma) per sample and integrates. One fused elementwise+scan
pass — XLA fuses the whole thing into a couple of kernels on TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeOutput(NamedTuple):
    rgb: jax.Array      # (SB, B, 3)
    depth: jax.Array    # (SB, B)
    weights: jax.Array  # (SB, B, K)


def composite(rgb, sigma, z_samp, rays, white_bkgd: bool = False):
    """Integrate per-sample radiance along rays.

    Args:
      rgb: (SB, B, K, 3) per-sample color (already sigmoid-activated).
      sigma: (SB, B, K) per-sample density (pre-relu; relu applied here,
        matching the reference).
      z_samp: (SB, B, K) ascending-sorted sample depths.
      rays: (SB, B, 8) — only [..., 7] (far) is read for the tail delta.
      white_bkgd: add (1 − Σw) to the color.

    Returns:
      CompositeOutput(rgb (SB,B,3), depth (SB,B), weights (SB,B,K)).
    """
    deltas = z_samp[..., 1:] - z_samp[..., :-1]
    delta_inf = rays[..., 7:8] - z_samp[..., -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (SB, B, K)

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigma))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transmittance = jnp.cumprod(shifted, axis=-1)  # (SB, B, K+1)
    weights = alphas * transmittance[..., :-1]

    rgb_final = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_final = jnp.sum(weights * z_samp, axis=-1)
    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)
        rgb_final = rgb_final + (1.0 - pix_alpha)[..., None]
    return CompositeOutput(rgb=rgb_final, depth=depth_final, weights=weights)
