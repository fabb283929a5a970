"""Host-side visualization helpers (colormaps, image/video writers).

Parity targets: reference ``src/util/torch_helpers.py:43-97`` (torch_cmap,
save_torch_video). Videos fall back to GIF when no ffmpeg backend is
available in the image.
"""

from __future__ import annotations

import numpy as np


def colorize(x: np.ndarray, cmap: str = "viridis", vmin=None, vmax=None
             ) -> np.ndarray:
    """(H, W) or (H, W, 1) scalar map → (H, W, 3) float RGB in [0, 1]."""
    import matplotlib.pyplot as plt

    x = np.asarray(x, np.float64)
    if x.ndim == 3:
        x = x[..., 0]
    lo = np.min(x) if vmin is None else vmin
    hi = np.max(x) if vmax is None else vmax
    denom = (hi - lo) if hi > lo else 1.0
    x = (x - lo) / denom
    return plt.get_cmap(cmap)(x)[..., :3].astype(np.float32)


def save_image(path, img: np.ndarray):
    """float (H, W, 3) in [0, 1] → 8-bit PNG."""
    import imageio.v2 as imageio

    img = np.clip(np.asarray(img), 0.0, 1.0)
    imageio.imwrite(path, (img * 255).astype(np.uint8))


def save_video(path, frames: np.ndarray, fps: int = 5):
    """frames (N, H, W, 3) in [0, 1] → mp4 (if ffmpeg available) else GIF."""
    import imageio.v2 as imageio

    frames8 = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    path = str(path)
    try:
        imageio.mimwrite(path, frames8, fps=fps, quality=10)
    except Exception:
        gif = path.rsplit(".", 1)[0] + ".gif"
        imageio.mimwrite(gif, frames8, duration=1.0 / fps)
        return gif
    return path
