"""Camera-space transforms and perspective projection (pure JAX).

Parity targets in the reference:
  - world→cam point transform: ``src/models/pixelnerf.py:91-93``
  - perspective projection + uv normalization ("outer pixel edges map to
    ±1", i.e. align_corners=False convention): ``src/models/pixelnerf.py:105-108``
"""

from __future__ import annotations

import jax.numpy as jnp


def world_to_cam(xyz, poses):
    """Transform world-space points into each source camera frame.

    Args:
      xyz: (SB, B, 3) world points.
      poses: (SB, NV, 4, 4) world→camera extrinsics.

    Returns:
      (SB, NV, B, 3) camera-space points.
    """
    rot = poses[:, :, :3, :3]  # (SB, NV, 3, 3)
    trans = poses[:, :, :3, 3]  # (SB, NV, 3)
    return (jnp.einsum("svij,sbj->svbi", rot, xyz, precision="highest")
            + trans[:, :, None, :])


def rotate_to_cam(dirs, poses):
    """Rotate world-space directions into each camera frame (no translation).

    Args:
      dirs: (SB, B, 3) world directions.
      poses: (SB, NV, 4, 4) extrinsics.

    Returns:
      (SB, NV, B, 3).
    """
    return jnp.einsum("svij,sbj->svbi", poses[:, :, :3, :3], dirs,
                      precision="highest")


def project_points(xyz_cam, focal, c):
    """Pinhole-project camera-space points to pixel coordinates.

    Args:
      xyz_cam: (SB, NV, B, 3) camera-space points.
      focal: (SB, NV, 2) [fx, fy].
      c: (SB, NV, 2) principal point [cx, cy].

    Returns:
      (SB, NV, B, 2) pixel coordinates (OpenCV convention).
    """
    uv = xyz_cam[..., :2] / xyz_cam[..., 2:3]
    return uv * focal[:, :, None, :] + c[:, :, None, :]


def uv_to_ndc(uv_pix, image_wh):
    """Map pixel coordinates to [-1, 1] where ±1 are the *outer pixel edges*.

    This matches the reference convention (align_corners=False):
    ``uv = uv / image_shape * 2 - 1``.

    Args:
      uv_pix: (..., 2) pixel coords.
      image_wh: (2,) [W, H] as floats (or python tuple).
    """
    wh = jnp.asarray(image_wh, dtype=uv_pix.dtype)
    return uv_pix / wh * 2.0 - 1.0


def invert_pose(pose):
    """Invert a (..., 4, 4) rigid world→cam transform analytically."""
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rot_inv = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_inv, t, precision="highest")
    top = jnp.concatenate([rot_inv, t_inv[..., None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def to_homogeneous(trafo):
    """(..., 3, 4) → (..., 4, 4) by appending [0, 0, 0, 1]."""
    bottom = jnp.zeros_like(trafo[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([trafo, bottom], axis=-2)
