"""Matrix-based bilinear resize with align_corners=True semantics.

``jax.image.resize`` has no align_corners=True mode, but the reference
upsamples its feature pyramid with ``F.interpolate(..., mode='bilinear',
align_corners=True)`` (``src/models/image_encoder.py:262-270``). A 1-D
linear interpolation is a (out, in) matrix product, so the 2-D resize is two
small matmuls — which is exactly what the MXU wants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation matrix."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        A[0, 0] = 1.0
        return A
    scale = (n_in - 1) / (n_out - 1)
    src = np.arange(n_out) * scale
    lo = np.clip(np.floor(src).astype(int), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w_hi = src - lo
    A[np.arange(n_out), lo] += 1.0 - w_hi
    A[np.arange(n_out), hi] += w_hi
    return A


def resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """Resize (..., H, W, C) → (..., out_h, out_w, C)."""
    H, W = x.shape[-3], x.shape[-2]
    if (H, W) == (out_h, out_w):
        return x
    Ah = jnp.asarray(_interp_matrix(H, out_h))
    Aw = jnp.asarray(_interp_matrix(W, out_w))
    x = jnp.einsum("oh,...hwc->...owc", Ah, x, precision="highest")
    x = jnp.einsum("ow,...hwc->...hoc", Aw, x, precision="highest")
    return x
