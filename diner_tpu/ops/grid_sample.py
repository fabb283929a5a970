"""Point-wise grid sampling (the framework's hottest primitive).

TPU-native replacement for ``torch.nn.functional.grid_sample`` restricted to
point queries (grid of shape (N, P, 2)), which is the only way the reference
uses it on the DINER path:

  - bilinear / border for latent-feature indexing
    (``src/models/image_encoder.py:97-127``)
  - nearest / border for depth indexing (``image_encoder.py:129-151``)
  - nearest / zeros for normal indexing (``image_encoder.py:182-204``)
  - nearest / *exponential* for depth-std indexing
    (``image_encoder.py:153-180``, ``src/util/torch_helpers.py:100-160``)

Exponential padding is computed **analytically** instead of materializing the
(H+2p)×(W+2p) padded canvas the reference builds: the padded value at overhang
distance d is ``border_value * 2^((d-1)/double_width)`` (d ≥ 1), zero outside
the padded canvas (``exp_padding_mode="zeros"``). Corner exponents take the
max of the per-axis exponents, matching the reference's overwrite order in
``torch_helpers.exponential_padding``.

Layout is channels-last: images are (N, H, W, C); one gathered point pulls a
contiguous C-vector, which maps well onto TPU lanes.

All functions use ``align_corners=False`` semantics:
``ix = ((x + 1) * W - 1) / 2``. Nearest rounds half-to-even, matching torch's
``std::nearbyint`` (and ``jnp.round``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord, size, align_corners: bool = False):
    """[-1, 1] → pixel coordinate (torch conventions)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_pixels(img, ix, iy):
    """Gather img[n, iy, ix, :] for integer index maps.

    img: (N, H, W, C); ix, iy: (N, P) int32 (already in-bounds).
    Returns (N, P, C).

    Implemented as one flat axis-0 take on (N*H*W, C): XLA lowers a
    leading-axis gather to a simpler dynamic-slice loop than a batched
    ``take_along_axis`` (~30% less device time measured on TPU for the
    sampler's map gather; same win applies to the 512-channel latent
    gather, the framework's hottest memory op).
    """
    img = jnp.asarray(img)  # accept host numpy (traced idx can't index np)
    N, H, W, C = img.shape
    P = ix.shape[-1]
    flat = img.reshape(N * H * W, C)
    base = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None]  # (N, 1)
    idx = (base + iy * W + ix).reshape(-1)  # (N*P,)
    return flat[idx].reshape(N, P, C)


def grid_sample_nearest(img, uv, padding_mode: str = "border"):
    """Nearest-neighbor point sampling.

    Args:
      img: (N, H, W, C).
      uv: (N, P, 2) normalized coords in [-1, 1] ([x, y]).
      padding_mode: "border" | "zeros".

    Returns:
      (N, P, C).
    """
    N, H, W, C = img.shape
    x = _unnormalize(uv[..., 0], W)
    y = _unnormalize(uv[..., 1], H)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    ix = jnp.round(x).astype(jnp.int32)
    iy = jnp.round(y).astype(jnp.int32)

    if padding_mode == "zeros":
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        out = _gather_pixels(img, ix, iy)
        return jnp.where(valid[..., None], out, jnp.zeros_like(out))
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        return _gather_pixels(img, ix, iy)
    else:
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")


def grid_sample_bilinear(img, uv, padding_mode: str = "border",
                         align_corners: bool = False):
    """Bilinear point sampling.

    Matches torch semantics: for "border", the *coordinate* is clipped to
    [0, size-1] before computing corner weights; for "zeros", out-of-bounds
    corners contribute zero.

    Args:
      img: (N, H, W, C).
      uv: (N, P, 2) normalized coords [x, y] in [-1, 1].

    Returns:
      (N, P, C).
    """
    N, H, W, C = img.shape
    x = _unnormalize(uv[..., 0], W, align_corners)
    y = _unnormalize(uv[..., 1], H, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(ix, iy, wgt):
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            wgt = jnp.where(valid, wgt, jnp.zeros_like(wgt))
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        return _gather_pixels(img, ixc, iyc) * wgt[..., None]

    return (
        corner(x0i, y0i, wx0 * wy0)
        + corner(x1i, y0i, wx1 * wy0)
        + corner(x0i, y1i, wx0 * wy1)
        + corner(x1i, y1i, wx1 * wy1)
    )


def _bilinear_corners(img_shape, uv, padding_mode: str,
                      align_corners: bool = False):
    """Shared index/weight computation for the bilinear sampler.

    Returns (ix, iy, w) lists of the 4 corners' clipped indices and weights
    (weights already zeroed for out-of-bounds corners in "zeros" mode).
    """
    N, H, W, C = img_shape
    x = _unnormalize(uv[..., 0], W, align_corners)
    y = _unnormalize(uv[..., 1], H, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = []
    for ix, iy, wgt in (
        (x0i, y0i, (1.0 - wx1) * (1.0 - wy1)),
        (x0i + 1, y0i, wx1 * (1.0 - wy1)),
        (x0i, y0i + 1, (1.0 - wx1) * wy1),
        (x0i + 1, y0i + 1, wx1 * wy1),
    ):
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            wgt = jnp.where(valid, wgt, jnp.zeros_like(wgt))
        out.append((jnp.clip(ix, 0, W - 1), jnp.clip(iy, 0, H - 1), wgt))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _gs_bilinear_imggrad(img, uv, padding_mode, img_shape, img_dtype,
                         align_corners):
    out, _ = _gs_bilinear_fwd(img, uv, padding_mode, img_shape, img_dtype,
                              align_corners)
    return out


def _gs_bilinear_fwd(img, uv, padding_mode, img_shape, img_dtype,
                     align_corners):
    corners = _bilinear_corners(img.shape, uv, padding_mode, align_corners)
    out = None
    for ix, iy, wgt in corners:
        term = _gather_pixels(img, ix, iy) * wgt[..., None].astype(img.dtype)
        out = term if out is None else out + term
    return out, uv


def _gs_bilinear_bwd(padding_mode, img_shape, img_dtype, align_corners,
                     uv, g):
    N, H, W, C = img_shape
    corners = _bilinear_corners(img_shape, uv, padding_mode, align_corners)
    base = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None]
    if C <= 32:
        # Narrow-channel path (MVS plane-sweep features, C = 8/16/32):
        # scatter CHANNELS-MAJOR. A (N·P, C≤32) f32 update tensor puts C in
        # the TPU lane dim and is padded ×(128/C) — measured 1.25 GB per
        # corner at MVS stage-3 (P = D·H·W = 2.6 M, C = 8), the peak of the
        # full-res training graph. (C, N·P) keeps the big point axis in
        # lanes: zero padding waste.
        P = uv.shape[1]
        # transpose FIRST, cast after: casting (N, P, C) to f32 before the
        # transpose materializes a lane-padded ×(128/C) f32 copy (measured
        # 1.25 GB at MVS stage-2 shapes); in (C, N·P) the f32 copy is
        # padding-free.
        gT = g.transpose(2, 0, 1).reshape(C, N * P).astype(jnp.float32)
        acc = jnp.zeros((C, N * H * W), jnp.float32)
        for ix, iy, wgt in corners:
            idx = (base + iy * W + ix).reshape(-1)
            acc = acc.at[:, idx].add(
                gT * wgt.reshape(1, -1).astype(jnp.float32))
        d_img = acc.reshape(C, N, H, W).transpose(1, 2, 3, 0).astype(
            img_dtype)
        return d_img, jnp.zeros_like(uv)
    acc = jnp.zeros((N * H * W, C), jnp.float32)
    g32 = g.astype(jnp.float32)
    for ix, iy, wgt in corners:
        idx = (base + iy * W + ix).reshape(-1)
        upd = (g32 * wgt[..., None].astype(jnp.float32)).reshape(-1, C)
        acc = acc.at[idx].add(upd)
    d_img = acc.reshape(N, H, W, C).astype(img_dtype)
    return d_img, jnp.zeros_like(uv)


_gs_bilinear_imggrad.defvjp(_gs_bilinear_fwd, _gs_bilinear_bwd)


def grid_sample_bilinear_imggrad(img, uv, padding_mode: str = "border",
                                 align_corners: bool = False):
    """Bilinear point sampling with a hand-written VJP for the image only.

    Numerically identical to :func:`grid_sample_bilinear` in the forward.
    The backward differs from autodiff in two deliberate ways (this is the
    framework's hottest gradient path — the 512-channel latent lookup, and
    the MVS plane-sweep warp when ``align_corners=True``):

      - **no uv cotangent** (zeros returned): on the DINER path the sample
        coordinates come from ``stop_gradient``-ed sample positions and
        camera constants (reference runs the sampler under ``no_grad``,
        ``src/models/nerf_renderer.py:65``), so the 4 corner *re-gathers* +
        channel reductions autodiff emits for d/d(uv) are dead weight;
      - **f32 scatter accumulation**: corner weights × cotangent are
        accumulated into an f32 canvas and cast back to ``img.dtype`` once
        (sub-word scatter-add is measured slower on TPU, and f32
        accumulation is more accurate for bf16 latents). For C ≤ 32 the
        scatter runs channels-major to dodge TPU lane padding (see
        ``_gs_bilinear_bwd``).
    """
    img = jnp.asarray(img)
    return _gs_bilinear_imggrad(img, uv, padding_mode, img.shape,
                                str(img.dtype), align_corners)


def exponential_pad_mult(ix, iy, H, W, pad_size, double_width, dtype):
    """Exponential-padding multiplier at unpadded nearest indices.

    Single source of truth for the replicate-pad ring math (reference
    ``src/util/torch_helpers.py:100-160``): per-axis overhang distance
    beyond the original canvas, exponent = max(overhang − 1, 0) with the
    per-axis max in corners, factor ``2^(exponent/double_width)``, and zero
    outside the ``pad_size``-padded canvas. Shared by
    :func:`grid_sample_exponential_nearest` and the fused sampler gather
    (``ops/sampling.py``).
    """
    dx = jnp.maximum(jnp.maximum(-ix, ix - (W - 1)), 0)
    dy = jnp.maximum(jnp.maximum(-iy, iy - (H - 1)), 0)
    exponent = jnp.maximum(
        jnp.maximum(dx - 1, 0), jnp.maximum(dy - 1, 0)
    ).astype(dtype)
    in_padded = (dx <= pad_size) & (dy <= pad_size)
    return jnp.where(in_padded, jnp.exp2(exponent / double_width), 0.0)


def grid_sample_exponential_nearest(
    img,
    uv,
    pad_size: int = 100,
    double_width: float = 12.0,
):
    """Nearest sampling with analytic exponential border extrapolation.

    Equivalent to the reference's replicate-pad-by-``pad_size`` canvas whose
    padded ring is multiplied by ``2^(exponent/double_width)`` (exponent =
    overhang distance − 1, per-axis max in corners), sampled with
    nearest/zeros on the padded canvas after rescaling the grid by
    ``size / (size + 2*pad_size)`` (align_corners=False).

    Args:
      img: (N, H, W, C) — for DINER this is the (N, H, W, 1) depth-std map.
      uv: (N, P, 2) normalized coords on the *original* canvas.

    Returns:
      (N, P, C); zero outside the padded canvas.
    """
    N, H, W, C = img.shape

    # Rescaling the grid onto the padded canvas and rounding there equals
    # rounding on the original canvas then shifting by the integer pad:
    # x_padded = x_unpadded + pad_size exactly (align_corners=False), so
    # the nearest texel is identical either way.
    ix = jnp.round(_unnormalize(uv[..., 0], W)).astype(jnp.int32)
    iy = jnp.round(_unnormalize(uv[..., 1], H)).astype(jnp.int32)
    mult = exponential_pad_mult(ix, iy, H, W, pad_size, double_width,
                                img.dtype)

    base = _gather_pixels(img, jnp.clip(ix, 0, W - 1), jnp.clip(iy, 0, H - 1))
    return base * mult[..., None]


def build_pair_table(img):
    """Parity-concatenated x-pair row table for wide-row bilinear gathers.

    (N, H, W, C) with even W → (2·N·H·(W/2), 2C): rows are horizontally
    adjacent texel pairs; the first N·H·W/2 rows are pairs starting at even
    x, the rest start at odd x (the last odd pair's right texel is a zero
    pad — it is only ever read with bilinear weight 0, since "border" mode
    clips x to W-1).

    Why: the TPU gather engine's per-row cost is strongly sublinear in row
    bytes (measured 43.7 GB/s at 1 KB rows vs 62-68 at 2 KB —
    GATHER_LAB.json), so fetching both x-corners as ONE 2C-wide row beats
    two C-wide fetches by ~1.27x once the table is prebuilt. Build cost is
    ~2 full-latent copies; :func:`grid_sample_bilinear_pairs` is therefore
    for the render-many-chunks-per-encode (eval) path, where one build
    amortizes over ~80 chunk gathers per image.
    """
    img = jnp.asarray(img)
    N, H, W, C = img.shape
    if W % 2:
        raise ValueError("pair table needs even W")
    even = img.reshape(N * H * (W // 2), 2 * C)
    odd = jnp.concatenate(
        [img[:, :, 1:, :], jnp.zeros((N, H, 1, C), img.dtype)], axis=2
    ).reshape(N * H * (W // 2), 2 * C)
    return jnp.concatenate([even, odd], axis=0)


def grid_sample_bilinear_pairs(pairs, img_shape, uv,
                               padding_mode: str = "border",
                               align_corners: bool = False):
    """Bilinear point sampling from a prebuilt pair table.

    Bit-identical to :func:`grid_sample_bilinear_imggrad`'s forward (same
    corner indices, same per-corner weight products cast to the table
    dtype, same accumulation order; the pair row simply delivers both
    x-corners in one gather). Forward-only fast path — autodiff works but
    scatters into the pair table; keep
    :func:`grid_sample_bilinear_imggrad` for training.

    Args:
      pairs: table from :func:`build_pair_table`.
      img_shape: the original (N, H, W, C).
      uv: (N, P, 2) normalized coords [x, y] in [-1, 1].

    Returns:
      (N, P, C).
    """
    N, H, W, C = img_shape
    P = uv.shape[1]
    x = _unnormalize(uv[..., 0], W, align_corners)
    y = _unnormalize(uv[..., 1], H, align_corners)
    if padding_mode != "border":
        raise ValueError("pair-table sampling supports border mode only")
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, H - 1)

    half = W // 2
    n_even = N * H * half
    nbase = (jnp.arange(N, dtype=jnp.int32) * H)[:, None]  # (N, 1)

    def row_idx(yy):
        base = nbase + yy
        idx_e = base * half + x0i // 2
        idx_o = n_even + base * half + (x0i - 1) // 2
        return jnp.where(x0i % 2 == 0, idx_e, idx_o).reshape(-1)

    g0 = pairs[row_idx(y0i)].reshape(N, P, 2, C)
    g1 = pairs[row_idx(y1i)].reshape(N, P, 2, C)

    def w(wgt):  # same product + cast the 4-corner path applies
        return wgt[..., None].astype(pairs.dtype)

    return (g0[:, :, 0] * w((1.0 - wx1) * (1.0 - wy1))
            + g0[:, :, 1] * w(wx1 * (1.0 - wy1))
            + g1[:, :, 0] * w((1.0 - wx1) * wy1)
            + g1[:, :, 1] * w(wx1 * wy1))


def grid_sample(img, uv, mode: str = "bilinear", padding_mode: str = "border",
                **exp_kwargs):
    """Dispatching wrapper mirroring the reference's extended grid_sample."""
    if padding_mode == "exponential":
        if mode != "nearest":
            raise NotImplementedError("exponential padding only with nearest")
        return grid_sample_exponential_nearest(img, uv, **exp_kwargs)
    if mode == "bilinear":
        return grid_sample_bilinear(img, uv, padding_mode)
    if mode == "nearest":
        return grid_sample_nearest(img, uv, padding_mode)
    raise ValueError(f"unsupported mode {mode!r}")
