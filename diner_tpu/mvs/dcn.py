"""Deformable convolution v2 as bilinear-gather + matmul (TPU-native).

Parity target: reference ``deps/TransMVSNet/models/dcn.py`` — DCNv2 with a
zero-initialized offset+mask conv feeding ``torchvision.ops.deform_conv2d``
(a CUDA kernel). Here the sampled taps are gathered with bilinear weights
(zeros outside) and contracted against the kernel with one big matmul, which
is exactly the shape the MXU wants: (N·H·W, K·C) × (K·C, O).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.nn.initializers import constant, zeros


def _corner_meta(img_shape, x, y, scale):
    """Shared fwd/bwd corner math: per-corner (flat idx, f32 weight)."""
    N, H, W, C = img_shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    base = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None]  # (N, 1)
    corners = []
    for ix, iy, w in ((x0i, y0i, (1 - wx1) * (1 - wy1)),
                      (x0i + 1, y0i, wx1 * (1 - wy1)),
                      (x0i, y0i + 1, (1 - wx1) * wy1),
                      (x0i + 1, y0i + 1, wx1 * wy1)):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        w = jnp.where(valid, w, 0.0)
        if scale is not None:
            w = w * scale.astype(jnp.float32)
        idx = base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        corners.append((idx, w, valid))
    return corners, (wx1, wy1)


@jax.custom_vjp
def _bilinear_sample_pix(img, x, y, scale):
    out, _ = _bsp_fwd(img, x, y, scale)
    return out


# Dispatch flag for the hand-written VJP. OFF by default: inside the FULL
# remat'd training graph the custom backward's regathers/scatter canvases
# defeat XLA's gather→consumer fusions and ~20 rematted 80 MB gather temps
# stay resident concurrently — the 512×640 training step OOMs (the
# autodiff graph fits at 14.12 GB peak). The kernel remains measurable in
# isolation via scripts/dcn_bwd_probe.py (which flips this flag); see
# BENCH.md round 4.
DCN_CUSTOM_VJP = False


def bilinear_sample_pix(img, x, y, scale=None):
    """Public wrapper (kwarg-friendly; custom_vjp args are positional)."""
    if DCN_CUSTOM_VJP:
        return _bilinear_sample_pix(img, x, y, scale)
    return bilinear_sample_pix_ref(img, x, y, scale)


def _bsp_fwd(img, x, y, scale):
    N, H, W, C = img.shape
    corners, _ = _corner_meta(img.shape, x, y, scale)
    flat = img.reshape(N * H * W, C)
    out = None
    for idx, w, _ in corners:
        term = flat[idx.reshape(-1)].reshape(idx.shape + (C,)) \
            * w.astype(img.dtype)[..., None]
        out = term if out is None else out + term
    return out, (img, x, y, scale)


def _bsp_bwd(res, g):
    """Hand-written VJP (the full-res MVS training step's hot gradient).

    MVS_ROOFLINE_r04 attributed ~70% of the 23.3 s full-res step to the
    FeatureNet DCN backward; DCN_ABLATE_r04 pinned it on the d_img
    scatter-adds, which run at ~7.8 M rows/s (vs 81 M rows/s for the
    forward gathers — scatter IS the silicon bound here). The win is
    halving the scatter rows: the two x-adjacent corners of each y-row
    are fused into ONE 2C-wide row update into parity pair canvases
    (2 scatters per sample point instead of 4), then stream-folded back.
    Offset/mask cotangents reuse one corner regather (gathers are cheap).
    A channels-major (C, N·HW) accumulation was tried first and measured
    SLOWER (column scatters touch 4 sublane tiles per index).
    """
    img, x, y, scale = res
    N, H, W, C = img.shape
    P = x.shape[1]
    corners, (wx1, wy1) = _corner_meta(img.shape, x, y, scale)
    flat = img.reshape(N * H * W, C)
    g32 = g.astype(jnp.float32)

    # ---- d_img: x-PAIRED corner scatters (DCN_ABLATE_r04: the scatter is
    # the bound at ~7.8 M rows/s vs 81 M rows/s gathers; fusing the two
    # x-adjacent corners of each y-row into ONE 2C-wide row update halves
    # the scatter rows). Parity canvases over column starts:
    #   even rows: x0 ∈ {0, 2, …, W-2}           (We = W/2 pair slots)
    #   odd  rows: x0 ∈ {-1, 1, …, W-1}          (Wo = W/2+1, cols -1…W
    #              with the two edge columns as discarded pads)
    # Out-of-bounds corners carry weight 0 exactly (the forward's `valid`
    # mask), so pad-column contributions are zeros — bit-equal to four
    # per-corner clipped scatters.
    if W % 2:
        # odd-W fallback (not an MVS shape): plain per-corner row scatters
        dw = []
        acc = jnp.zeros((N * H * W, C), jnp.float32)
        for idx, w, _ in corners:
            fi = idx.reshape(-1)
            v = flat[fi].reshape(idx.shape + (C,)).astype(jnp.float32)
            dw.append(jnp.sum(g32 * v, axis=-1))
            upd = g32 * w.astype(img.dtype).astype(jnp.float32)[..., None]
            acc = acc.at[fi].add(upd.reshape(-1, C))
        d_img = acc.reshape(N, H, W, C).astype(img.dtype)
        return (d_img,) + _bsp_bwd_rest(res, corners, dw, wx1, wy1)

    We, Wo = W // 2, W // 2 + 1
    n_even = N * H * We
    rows = N * H * (We + Wo)
    nbase = (jnp.arange(N, dtype=jnp.int32) * H)[:, None]

    x0i = jnp.floor(x.astype(jnp.float32)).astype(jnp.int32)
    y0i = jnp.floor(y.astype(jnp.float32)).astype(jnp.int32)
    x0c = jnp.clip(x0i, -1, W - 1)
    parity_odd = (x0c % 2) != 0

    def pair_row(yy):
        base = nbase + jnp.clip(yy, 0, H - 1)
        idx_e = base * We + x0c // 2
        idx_o = n_even + base * Wo + (x0c + 1) // 2
        return jnp.where(parity_odd, idx_o, idx_e).reshape(-1)

    # CHUNKED scan over the point axis: one shared (rows, 2C) f32 canvas
    # carried in place; per-chunk temps are a few MB, so the backward
    # composes with the full remat'd training graph (an unchunked version
    # OOM'd it: every tap's regathers/updates were resident at once).
    NP = N * P
    chunk = min(131072, NP)
    pad = (-NP) % chunk
    nch = (NP + pad) // chunk

    def padded(a, fill=0):
        a = a.reshape(NP, *a.shape[1:] if a.ndim > 1 else [])
        if pad:
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, width, constant_values=fill)
        return a.reshape(nch, chunk, *a.shape[1:])

    fidx_c = padded(jnp.stack([c[0].reshape(-1) for c in corners], -1))
    wq_c = padded(jnp.stack(
        [c[1].astype(img.dtype).astype(jnp.float32).reshape(-1)
         for c in corners], -1))  # quantized weights, f32 (match fwd)
    pr_c = padded(jnp.stack([pair_row(y0i), pair_row(y0i + 1)], -1))
    g_c = padded(g32.reshape(NP, C))

    def body(acc, inp):
        fi, wq, pr, gc = inp  # (chunk,4) (chunk,4) (chunk,2) (chunk,C)
        dwc = []
        for k in range(4):
            v = flat[fi[:, k]].astype(jnp.float32)
            dwc.append(jnp.sum(gc * v, axis=-1))
        for j, (l, r) in enumerate(((0, 1), (2, 3))):
            upd = jnp.concatenate(
                [gc * wq[:, l:l + 1], gc * wq[:, r:r + 1]], axis=-1)
            acc = acc.at[pr[:, j]].add(upd)
        return acc, jnp.stack(dwc, -1)  # ys (chunk, 4)

    acc0 = jnp.zeros((rows, 2 * C), jnp.float32)
    acc, dws = jax.lax.scan(body, acc0, (fidx_c, wq_c, pr_c, g_c))
    dws = dws.reshape(nch * chunk, 4)[:NP]
    dw = [dws[:, k].reshape(N, P) for k in range(4)]

    even = acc[:n_even].reshape(N, H, We, 2, C).reshape(N, H, W, C)
    odd = acc[n_even:].reshape(N, H, Wo, 2, C).reshape(N, H, 2 * Wo, C)
    d_img = (even + odd[:, :, 1:W + 1]).astype(img.dtype)
    return (d_img,) + _bsp_bwd_rest(res, corners, dw, wx1, wy1)


def _bsp_bwd_rest(res, corners, dw, wx1, wy1):
    """Offset/mask cotangents shared by both d_img scatter layouts."""
    img, x, y, scale = res
    # weight-product derivatives (w_base = bilinear product, pre-mask):
    # forward applied  w = where(valid, w_base, 0) [* scale]
    sc = (scale.astype(jnp.float32) if scale is not None
          else jnp.ones_like(wx1))
    dwb = [jnp.where(c[2], d * sc, 0.0) for c, d in zip(corners, dw)]
    d_wx1 = (-dwb[0] * (1 - wy1) + dwb[1] * (1 - wy1)
             - dwb[2] * wy1 + dwb[3] * wy1)
    d_wy1 = (-dwb[0] * (1 - wx1) - dwb[1] * wx1
             + dwb[2] * (1 - wx1) + dwb[3] * wx1)
    d_x = d_wx1.astype(x.dtype)
    d_y = d_wy1.astype(y.dtype)

    if scale is None:
        d_scale = None
    else:
        wb = [jnp.where(c[2], wgt, 0.0) for c, wgt in
              ((corners[0], (1 - wx1) * (1 - wy1)),
               (corners[1], wx1 * (1 - wy1)),
               (corners[2], (1 - wx1) * wy1),
               (corners[3], wx1 * wy1))]
        d_scale = sum(b * d for b, d in zip(wb, dw)).astype(scale.dtype)
    return d_x, d_y, d_scale


_bilinear_sample_pix.defvjp(_bsp_fwd, _bsp_bwd)


def bilinear_sample_pix_ref(img, x, y, scale=None):
    """Bilinear sample at unnormalized pixel positions, zeros outside.

    img: (N, H, W, C); x, y: (N, P) — positions are taken in f32 (integer
    pixel indices above 256 are not exactly representable in bf16), the
    sampled values stay in ``img.dtype``. ``scale`` is an optional (N, P)
    per-point multiplier (the DCNv2 modulation mask) folded into the
    bilinear weights **in f32** so the tap weight is quantized to
    ``img.dtype`` exactly once, after all weight math. Returns (N, P, C).
    Matches torchvision deform_conv2d's sampler (corner taps fully outside
    contribute zero).
    """
    N, H, W, C = img.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    flat = img.reshape(N, H * W, C)

    def tap(ix, iy, w):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        w = jnp.where(valid, w, 0.0)
        if scale is not None:
            w = w * scale.astype(jnp.float32)
        w = w.astype(img.dtype)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1) * w[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (tap(x0i, y0i, (1 - wx1) * (1 - wy1))
            + tap(x0i + 1, y0i, wx1 * (1 - wy1))
            + tap(x0i, y0i + 1, (1 - wx1) * wy1)
            + tap(x0i + 1, y0i + 1, wx1 * wy1))


class DeformConv2d(nn.Module):
    """DCNv2: learned per-tap offsets + sigmoid modulation masks.

    Input (N, H, W, C) → (N, H, W, features); 3×3, stride 1, padding 1
    (the only configuration the reference uses).
    """

    features: int
    kernel: int = 3
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        k = self.kernel
        K = k * k
        pad = k // 2

        # offset+mask conv, zero-initialized (reference init_offset)
        om = nn.Conv(3 * K, (k, k), padding=[(pad, pad)] * 2,
                     kernel_init=zeros, bias_init=constant(0.0),
                     dtype=self.dtype, name="conv_offset_mask")(x)
        # torchvision layout: offset channels interleave (dy, dx) per tap;
        # the reference builds offset = cat(chunk1, chunk2) of its conv, so
        # tap k reads channels (2k, 2k+1) of that concatenation
        offset = om[..., : 2 * K].astype(jnp.float32)  # exact pixel math
        off_y = offset[..., 0::2]     # (N, H, W, K)
        off_x = offset[..., 1::2]
        mask = nn.sigmoid(om[..., 2 * K:].astype(jnp.float32))  # (N, H, W, K)

        # torch DCNv2 init: uniform(-stdv, stdv), stdv = 1/sqrt(C*K)
        stdv = float(1.0 / (C * K) ** 0.5)

        def _uniform_sym(key, shape, dtype=jnp.float32):
            import jax
            return jax.random.uniform(key, shape, dtype, -stdv, stdv)

        kernel = self.param("kernel", _uniform_sym, (K * C, self.features))
        kmat = kernel.reshape(K, C, self.features).astype(x.dtype)

        # Sum of per-tap matmuls: Σ_t (tap_t · mask_t) @ W_t ≡ the im2col
        # concat @ W, but never materializes the (N, H, W, K·C) patch
        # tensor (1.4 GB at DTU stage-3 shapes — the HBM peak of the
        # full-res training graph). The cross-tap accumulator is f32 (the
        # im2col form summed all K·C products in f32 inside the MXU) and
        # CHANNELS-MAJOR (N, F, H·W): an (N, H·W, F≤32) f32 buffer would
        # be TPU-lane-padded ×(128/F); with the big pixel axis minor the
        # padding is zero. Cast + transpose to x.dtype once at the end.
        gy = jnp.arange(H, dtype=jnp.float32)[:, None]
        gx = jnp.arange(W, dtype=jnp.float32)[None, :]
        out = jnp.zeros((N, self.features, H * W), jnp.float32)
        t = 0
        for dy in range(-pad, pad + 1):
            for dx in range(-pad, pad + 1):
                sy = gy + dy + off_y[..., t]  # (N, H, W)
                sx = gx + dx + off_x[..., t]
                s = bilinear_sample_pix(
                    x, sx.reshape(N, -1), sy.reshape(N, -1),
                    scale=mask[..., t].reshape(N, -1))  # (N, HW, C)
                # einsum in x.dtype (MXU accumulates f32 internally), cast
                # the per-tap RESULT to f32 for the cross-tap sum: with
                # preferred_element_type=f32 the einsum's backward emits
                # f32 (N·H·W, C) cotangents (160 MB each ×7 live at MVS
                # full-res); the astype keeps the backward in x.dtype.
                out = out + jnp.einsum("npc,cf->nfp", s,
                                       kmat[t]).astype(jnp.float32)
                t += 1
        out = out.transpose(0, 2, 1).astype(x.dtype).reshape(
            N, H, W, self.features)
        if self.use_bias:
            bias = self.param("bias", constant(0.0), (self.features,),
                              jnp.float32)
            out = out + bias.astype(out.dtype)
        return out
