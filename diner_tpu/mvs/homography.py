"""Differentiable plane-sweep homography warping.

Parity target: reference ``deps/TransMVSNet/models/module.py:284-322``
(homo_warping): per-depth-hypothesis projection of source-view features into
the reference frustum, sampled bilinearly (zeros padding,
align_corners=True) with invalid (z < 1e-6) pixels pushed off-grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diner_tpu.ops.grid_sample import grid_sample_bilinear_imggrad


def homo_warping(src_fea, src_proj, ref_proj, depth_values):
    """Warp source features to reference-view depth hypotheses.

    Args:
      src_fea: (B, H, W, C) source features.
      src_proj / ref_proj: (B, 4, 4) full projection matrices (K·[R|t]).
      depth_values: (B, D) or (B, D, H, W) hypothesis depths.

    Returns:
      (B, D, H, W, C) warped features.
    """
    B, H, W, C = src_fea.shape
    D = depth_values.shape[1]

    # ALL projection math in f32 regardless of the feature dtype: bf16
    # cannot represent integer pixel coordinates above 256 (257 rounds),
    # which would quantize the warp grid at 512×640 / 256×320 shapes.
    # Only the sampled feature values stay in src_fea.dtype.
    proj = (src_proj.astype(jnp.float32)
            @ jnp.linalg.inv(ref_proj.astype(jnp.float32)))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xyz = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones(H * W, jnp.float32)])
    rot_xyz = jnp.einsum("bij,jp->bip", rot, xyz,
                         precision="highest")  # (B, 3, HW)
    dv = depth_values.astype(jnp.float32).reshape(B, 1, D, -1)
    rot_depth_xyz = rot_xyz[:, :, None, :] * dv  # (B, 3, D, HW)
    proj_xyz = rot_depth_xyz + trans[:, :, None, None]
    z = proj_xyz[:, 2]  # (B, D, HW)
    invalid = z < 1e-6
    xy = proj_xyz[:, :2] / jnp.where(invalid[:, None], jnp.ones_like(z[:, None]), z[:, None])
    x_n = xy[:, 0] / ((W - 1) / 2.0) - 1.0
    y_n = xy[:, 1] / ((H - 1) / 2.0) - 1.0
    x_n = jnp.where(invalid, -99.0, x_n)
    y_n = jnp.where(invalid, -99.0, y_n)
    grid = jnp.stack([x_n, y_n], axis=-1)  # (B, D, HW, 2)
    grid = jax.lax.stop_gradient(grid)

    # imggrad variant: the grid is stop_gradient-ed (exactly like the
    # reference, where hypotheses derive from a detached prior depth), so
    # the hand-written VJP skips the dead uv cotangent AND scatters the
    # narrow-channel feature grads channels-major — the (D·H·W, C≤32)
    # lane-padded cotangents were the HBM peak of the full-res training
    # graph (BENCH.md "HBM OOM forensics").
    warped = grid_sample_bilinear_imggrad(
        src_fea, grid.reshape(B, D * H * W, 2), padding_mode="zeros",
        align_corners=True)
    return warped.reshape(B, D, H, W, C)
