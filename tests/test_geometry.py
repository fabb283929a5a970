"""Parity tests for diner_tpu.geometry against torch re-implementations of the
reference math (``src/util/cam_geometry.py:36-79``, ``src/util/depth2normal.py``).
"""

import numpy as np
import torch
import jax.numpy as jnp

from diner_tpu.geometry import (
    gen_rays,
    depth_to_normal,
    world_to_cam,
    project_points,
    uv_to_ndc,
    invert_pose,
)


def _random_camera(rng, B):
    """Random look-at-ish extrinsics + plausible intrinsics."""
    extr = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    for b in range(B):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        angle = rng.rand() * 0.8
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
        extr[b, :3, :3] = R.astype(np.float32)
        extr[b, :3, 3] = rng.randn(3).astype(np.float32) * 0.3 + [0, 0, 1.5]
    intr = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    intr[:, 0, 0] = 200 + rng.rand(B) * 100
    intr[:, 1, 1] = 200 + rng.rand(B) * 100
    intr[:, 0, 2] = 30 + rng.rand(B) * 10
    intr[:, 1, 2] = 25 + rng.rand(B) * 10
    return extr, intr


def _torch_gen_rays(extrinsics, intrinsics, W, H, z_near, z_far):
    """Direct re-statement of the reference gen_rays math in torch."""
    extrinsics = torch.from_numpy(extrinsics)
    intrinsics = torch.from_numpy(intrinsics)
    z_near = torch.from_numpy(z_near)
    z_far = torch.from_numpy(z_far)
    B = extrinsics.shape[0]
    focal = intrinsics[:, [0, 1], [0, 1]]
    c = intrinsics[:, [0, 1], [-1, -1]]
    grid = torch.stack(
        torch.meshgrid(torch.arange(0.5, H, 1.0), torch.arange(0.5, W, 1.0),
                       indexing="ij")[::-1], dim=-1)
    grid = grid.unsqueeze(0).expand(B, -1, -1, -1)
    pc = (grid - c.view(B, 1, 1, 2)) / focal.view(B, 1, 1, 2)
    pc = torch.cat((pc, torch.ones_like(pc[..., :1])), dim=-1)
    dirs_cam = pc / pc.pow(2).sum(dim=-1, keepdim=True).sqrt()
    r_c2w = extrinsics[:, :3, :3].permute(0, 2, 1)
    dirs_w = (r_c2w @ dirs_cam.view(B, -1, 3).permute(0, 2, 1)).permute(0, 2, 1).view(B, H, W, 3)
    centers = (-1 * r_c2w @ extrinsics[:, :3, -1:])
    origins = centers.view(B, 1, 1, 3).expand(-1, H, W, -1)
    near = z_near.view(B, 1, 1, 1).expand(-1, H, W, -1)
    far = z_far.view(B, 1, 1, 1).expand(-1, H, W, -1)
    return torch.cat((origins, dirs_w, near, far), dim=-1).numpy()


def test_gen_rays_matches_reference_math():
    rng = np.random.RandomState(0)
    B, H, W = 3, 10, 14
    extr, intr = _random_camera(rng, B)
    znear = np.full((B,), 0.5, np.float32)
    zfar = np.full((B,), 2.5, np.float32)
    ours = np.asarray(gen_rays(jnp.asarray(extr), jnp.asarray(intr), W, H,
                               jnp.asarray(znear), jnp.asarray(zfar)))
    ref = _torch_gen_rays(extr, intr, W, H, znear, zfar)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_gen_rays_dirs_unit_norm():
    rng = np.random.RandomState(1)
    extr, intr = _random_camera(rng, 2)
    rays = gen_rays(jnp.asarray(extr), jnp.asarray(intr), 8, 6,
                    jnp.ones(2), 2 * jnp.ones(2))
    norms = np.linalg.norm(np.asarray(rays[..., 3:6]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_project_roundtrip():
    """Unprojecting a pixel through gen_rays and reprojecting recovers it."""
    rng = np.random.RandomState(2)
    extr, intr = _random_camera(rng, 2)
    H, W = 12, 16
    rays = gen_rays(jnp.asarray(extr), jnp.asarray(intr), W, H,
                    jnp.ones(2), 2 * jnp.ones(2))
    rays = np.asarray(rays).reshape(2, -1, 8)
    pts = rays[..., :3] + 1.3 * rays[..., 3:6]  # world points along rays
    poses = jnp.asarray(extr)[:, None]  # (SB, NV=1, 4, 4)
    xyz_cam = world_to_cam(jnp.asarray(pts), poses)
    focal = jnp.asarray(intr)[:, None, jnp.array([0, 1]), jnp.array([0, 1])]
    c = jnp.asarray(intr)[:, None, :2, 2]
    uv = np.asarray(project_points(xyz_cam, focal, c))[:, 0]  # (B, P, 2)
    gx, gy = np.meshgrid(np.arange(0.5, W), np.arange(0.5, H))
    expected = np.stack([gx, gy], -1).reshape(-1, 2)
    for b in range(2):
        np.testing.assert_allclose(uv[b], expected, atol=2e-2)


def test_uv_to_ndc_outer_edges():
    uv = jnp.asarray([[[0.0, 0.0], [16.0, 12.0], [8.0, 6.0]]])
    ndc = np.asarray(uv_to_ndc(uv, (16.0, 12.0)))
    np.testing.assert_allclose(ndc[0, 0], [-1, -1], atol=1e-6)
    np.testing.assert_allclose(ndc[0, 1], [1, 1], atol=1e-6)
    np.testing.assert_allclose(ndc[0, 2], [0, 0], atol=1e-6)


def test_invert_pose():
    rng = np.random.RandomState(3)
    extr, _ = _random_camera(rng, 4)
    inv = np.asarray(invert_pose(jnp.asarray(extr)))
    prod = np.einsum("bij,bjk->bik", extr, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def _torch_depth2normal(dmap, K):
    """Re-statement of reference depth2normal (src/util/depth2normal.py)."""
    dmap = torch.from_numpy(dmap)[:, None]  # N,1,H,W
    K = torch.from_numpy(K)
    N, _, H, W = dmap.shape
    rays = torch.stack(torch.meshgrid(torch.arange(0.5, H, 1.0),
                                      torch.arange(0.5, W, 1.0),
                                      indexing="ij")[::-1], dim=-1).reshape(-1, 2)
    rays = rays.unsqueeze(0).expand(N, -1, -1).clone()
    rays -= K[:, [0, 1], -1].unsqueeze(-2)
    rays /= K[:, [0, 1], [0, 1]].unsqueeze(-2)
    rays = torch.cat((rays, torch.ones_like(rays[..., -1:])), dim=-1)
    pts = rays.view(N, H, W, 3) * dmap.view(N, H, W, 1)
    pts = pts.permute(0, 3, 1, 2)
    pts = torch.nn.functional.pad(pts, [1] * 4, mode="replicate")
    down = pts[:, :, 2:, 1:-1]
    up = pts[:, :, :-2, 1:-1]
    right = pts[:, :, 1:-1, 2:]
    left = pts[:, :, 1:-1, :-2]
    vdiff = (down - up).permute(0, 2, 3, 1)
    hdiff = (right - left).permute(0, 2, 3, 1)
    normal = torch.cross(vdiff, hdiff, dim=-1)
    normal = normal / torch.norm(normal, p=2, dim=-1, keepdim=True)
    idx_map = torch.stack(torch.meshgrid(torch.arange(N), torch.arange(H),
                                         torch.arange(W), indexing="ij"), dim=-1)
    offset_map = torch.zeros_like(idx_map)
    for tensor, axis, delta in ((down, 1, -1), (up, 1, 1),
                                (right, 2, -1), (left, 2, 1)):
        sel = torch.zeros(3, dtype=torch.bool)
        sel[axis] = True
        helper = (tensor[:, 0] == 0)[..., None] & sel.view(1, 1, 1, 3)
        offset_map[helper] += delta
    offset_mask = torch.any(offset_map != 0, dim=-1)
    new_idcs = idx_map[offset_mask] + offset_map[offset_mask]
    new_idcs[:, 1] = new_idcs[:, 1].clip(min=0, max=H - 1)
    new_idcs[:, 2] = new_idcs[:, 2].clip(min=0, max=W - 1)
    normal[offset_mask] = normal[new_idcs[:, 0], new_idcs[:, 1], new_idcs[:, 2]]
    normal[dmap[:, 0] == 0] = 0
    return normal.numpy()


def test_depth_to_normal_matches_reference():
    rng = np.random.RandomState(4)
    N, H, W = 2, 20, 24
    _, intr = _random_camera(rng, N)
    # smooth depth with a hole (invalid region)
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    dmap = (1.5 + 0.3 * np.sin(2 * gx) * np.cos(2 * gy)).astype(np.float32)
    dmap = np.tile(dmap, (N, 1, 1))
    dmap[:, 5:9, 7:12] = 0.0
    ours = np.asarray(depth_to_normal(jnp.asarray(dmap), jnp.asarray(intr)))
    ref = _torch_depth2normal(dmap, intr)
    # compare only where reference is finite (it produces NaN on degenerate
    # cross products; we safe-divide those to 0)
    finite = np.isfinite(ref).all(axis=-1)
    assert finite.mean() > 0.95
    np.testing.assert_allclose(ours[finite], ref[finite], atol=1e-4)
