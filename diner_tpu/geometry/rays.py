"""Camera-ray generation (OpenCV convention, half-pixel centers).

Functional parity target: reference ``src/util/cam_geometry.py:36-79``
(gen_rays): pixel centers at (col+0.5, row+0.5), unprojection through
focal/principal point, *normalized* ray directions rotated into world space,
origins at the camera center -Rᵀt, packed as (B, H, W, 8) =
[origin(3), direction(3), near(1), far(1)].
"""

from __future__ import annotations

import jax.numpy as jnp


def gen_rays(extrinsics, intrinsics, W: int, H: int, z_near, z_far):
    """Generate world-space camera rays for every pixel.

    Args:
      extrinsics: (B, 4, 4) world→camera transforms.
      intrinsics: (B, 3, 3) pinhole intrinsics.
      W, H: static image width / height.
      z_near, z_far: (B,) near/far bounds along the (normalized) ray.

    Returns:
      (B, H, W, 8) rays: [origin(3), direction(3), near(1), far(1)].
      Directions are unit-norm in world space.
    """
    B = extrinsics.shape[0]
    dtype = extrinsics.dtype

    intrinsics = jnp.asarray(intrinsics)  # accept host numpy
    focal = intrinsics[:, jnp.array([0, 1]), jnp.array([0, 1])]  # (B, 2) fx, fy
    c = intrinsics[:, :2, 2]  # (B, 2) cx, cy

    # pixel centers in screen coords, OpenCV convention (x right, y down)
    xs = jnp.arange(0.5, W, 1.0, dtype=dtype)
    ys = jnp.arange(0.5, H, 1.0, dtype=dtype)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (H, W) each
    pcoords = jnp.stack([grid_x, grid_y], axis=-1)  # (H, W, 2) [x, y]

    pcoords_cam = (pcoords[None] - c[:, None, None]) / focal[:, None, None]  # (B,H,W,2)
    pcoords_cam = jnp.concatenate(
        [pcoords_cam, jnp.ones_like(pcoords_cam[..., :1])], axis=-1
    )  # (B, H, W, 3)
    raydirs_cam = pcoords_cam / jnp.linalg.norm(pcoords_cam, axis=-1, keepdims=True)

    rot_c2w = jnp.swapaxes(extrinsics[:, :3, :3], -1, -2)  # (B, 3, 3)
    raydirs_world = jnp.einsum("bij,bhwj->bhwi", rot_c2w, raydirs_cam,
                               precision="highest")

    cam_centers = -jnp.einsum("bij,bj->bi", rot_c2w, extrinsics[:, :3, 3],
                              precision="highest")  # (B, 3)
    origins = jnp.broadcast_to(cam_centers[:, None, None, :], (B, H, W, 3))

    near = jnp.broadcast_to(jnp.reshape(z_near, (B, 1, 1, 1)), (B, H, W, 1)).astype(dtype)
    far = jnp.broadcast_to(jnp.reshape(z_far, (B, 1, 1, 1)), (B, H, W, 1)).astype(dtype)

    return jnp.concatenate([origins, raydirs_world, near, far], axis=-1)
