"""Depth-map → normal-map via central differences (scatter-free JAX).

Parity target: reference ``src/util/depth2normal.py:7-87``:
unproject depth to camera-space points, central differences, cross product,
normalize; boundary cleanup substitutes the normal of a shifted neighbor where
an adjacent point is invalid (x == 0); zero where depth == 0.

The reference implements the cleanup with boolean fancy indexing; here it is a
masked gather so everything stays statically shaped and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_normal(dmap, intrinsics):
    """Compute camera-space normal maps from depth maps.

    Args:
      dmap: (N, H, W) depth (0 = invalid).
      intrinsics: (N, 3, 3).

    Returns:
      (N, H, W, 3) unit normals; zero where depth == 0.
    """
    N, H, W = dmap.shape
    dtype = dmap.dtype

    intrinsics = jnp.asarray(intrinsics)  # accept host numpy
    focal = intrinsics[:, jnp.array([0, 1]), jnp.array([0, 1])]  # (N, 2)
    c = intrinsics[:, :2, 2]  # (N, 2)

    xs = jnp.arange(0.5, W, 1.0, dtype=dtype)
    ys = jnp.arange(0.5, H, 1.0, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    rays = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
    rays = (rays[None] - c[:, None, None]) / focal[:, None, None]  # (N, H, W, 2)
    rays = jnp.concatenate([rays, jnp.ones_like(rays[..., :1])], axis=-1)  # (N,H,W,3)

    pts = rays * dmap[..., None]  # (N, H, W, 3)
    pts_pad = jnp.pad(pts, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    down = pts_pad[:, 2:, 1:-1]    # (N, H, W, 3)
    up = pts_pad[:, :-2, 1:-1]
    right = pts_pad[:, 1:-1, 2:]
    left = pts_pad[:, 1:-1, :-2]

    vdiff = down - up
    hdiff = right - left
    normal = jnp.cross(vdiff, hdiff)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(norm == 0, jnp.ones_like(norm), norm)

    # Boundary cleanup: where an adjacent point is invalid (x-coordinate == 0,
    # the reference's invalid-depth proxy), borrow the normal from the pixel
    # shifted away from the invalid neighbor. Offsets accumulate and cancel,
    # matching the reference's `offset_map[helper] += ±1` semantics.
    dy = (-(down[..., 0] == 0).astype(jnp.int32)
          + (up[..., 0] == 0).astype(jnp.int32))
    dx = (-(right[..., 0] == 0).astype(jnp.int32)
          + (left[..., 0] == 0).astype(jnp.int32))
    offset_mask = (dy != 0) | (dx != 0)

    row_ids = jnp.broadcast_to(jnp.arange(H)[None, :, None], (N, H, W))
    col_ids = jnp.broadcast_to(jnp.arange(W)[None, None, :], (N, H, W))
    new_row = jnp.clip(row_ids + dy, 0, H - 1)
    new_col = jnp.clip(col_ids + dx, 0, W - 1)

    flat = normal.reshape(N, H * W, 3)
    gathered = jnp.take_along_axis(
        flat, (new_row * W + new_col).reshape(N, H * W, 1), axis=1
    ).reshape(N, H, W, 3)
    normal = jnp.where(offset_mask[..., None], gathered, normal)

    normal = jnp.where((dmap == 0)[..., None], jnp.zeros_like(normal), normal)
    return normal
