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


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool = True
                   ) -> np.ndarray:
    """(n_out, n_in) linear interpolation matrix (torch semantics)."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1 and align_corners:
        A[0, 0] = 1.0
        return A
    if align_corners:
        scale = (n_in - 1) / (n_out - 1)
        src = np.arange(n_out) * scale
    else:
        scale = n_in / n_out
        src = np.clip((np.arange(n_out) + 0.5) * scale - 0.5, 0, n_in - 1)
    lo = np.clip(np.floor(src).astype(int), 0, n_in - 1)
    hi = np.clip(lo + 1, 0, n_in - 1)
    w_hi = src - lo
    A[np.arange(n_out), lo] += 1.0 - w_hi
    A[np.arange(n_out), hi] += w_hi
    return A


def resize_bilinear_align_corners(x, out_h: int, out_w: int):
    """Resize (..., H, W, C) → (..., out_h, out_w, C), align_corners=True."""
    return resize_linear_2d(x, out_h, out_w, align_corners=True)


def _matmul_precision(dtype):
    # f32 inputs keep exact 2-tap interpolation via the multi-pass MXU mode;
    # bf16 inputs are already rounded, so default single-pass bf16 matmuls
    # are both faster and dtype-consistent (an f32 matrix would silently
    # promote the result — and everything downstream — to f32).
    return "highest" if dtype == jnp.float32 else None


def resize_linear_2d(x, out_h: int, out_w: int, align_corners: bool = False):
    """torch F.interpolate(mode='bilinear') on the (-3, -2) axes of
    channels-last input, as two small matmuls (MXU-friendly)."""
    H, W = x.shape[-3], x.shape[-2]
    if (H, W) == (out_h, out_w):
        return x
    prec = _matmul_precision(x.dtype)
    Ah = jnp.asarray(_interp_matrix(H, out_h, align_corners), dtype=x.dtype)
    Aw = jnp.asarray(_interp_matrix(W, out_w, align_corners), dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", Ah, x, precision=prec)
    x = jnp.einsum("ow,...hwc->...hoc", Aw, x, precision=prec)
    return x


def resize_linear_axis(x, out_n: int, axis: int, align_corners: bool = False):
    """1-D linear resize along `axis` (building block for trilinear)."""
    n_in = x.shape[axis]
    if n_in == out_n:
        return x
    A = jnp.asarray(_interp_matrix(n_in, out_n, align_corners), dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.einsum("on,...n->...o", A, x,
                   precision=_matmul_precision(x.dtype))
    return jnp.moveaxis(x, -1, axis)


def resize_trilinear(x, out_d: int, out_h: int, out_w: int,
                     align_corners: bool = False):
    """torch F.interpolate(mode='trilinear') on (-4, -3, -2) of
    channels-last (..., D, H, W, C) input."""
    x = resize_linear_axis(x, out_d, -4, align_corners)
    x = resize_linear_axis(x, out_h, -3, align_corners)
    x = resize_linear_axis(x, out_w, -2, align_corners)
    return x


@functools.lru_cache(maxsize=64)
def _cubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bicubic (Keys a=-0.75) interpolation matrix,
    align_corners=True, border-replicated taps (torch semantics)."""
    a = -0.75

    def w(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    A = np.zeros((n_out, n_in), dtype=np.float32)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        src = i * scale
        base = int(np.floor(src))
        for tap in range(base - 1, base + 3):
            A[i, min(max(tap, 0), n_in - 1)] += w(src - tap)
    return A


def resize_bicubic_align_corners(x, out_h: int, out_w: int):
    """torch F.interpolate(mode='bicubic', align_corners=True) on
    channels-last (..., H, W, C) — two small matmuls."""
    H, W = x.shape[-3], x.shape[-2]
    if (H, W) == (out_h, out_w):
        return x
    prec = _matmul_precision(x.dtype)
    Ah = jnp.asarray(_cubic_matrix(H, out_h), dtype=x.dtype)
    Aw = jnp.asarray(_cubic_matrix(W, out_w), dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", Ah, x, precision=prec)
    x = jnp.einsum("ow,...hwc->...hoc", Aw, x, precision=prec)
    return x


def resize_nearest_2x(x):
    """torch F.interpolate(scale_factor=2, mode='nearest') on channels-last
    (..., H, W, C)."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)
