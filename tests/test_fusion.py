"""Fusion library tests: build the C++ core, fuse a synthetic plane observed
by several cameras, verify consistency filtering and the PLY/dmb protocols."""

import numpy as np
import pytest

from diner_tpu.fusion import (
    build_library,
    fuse_depth_maps,
    read_gipuma_dmb,
    write_gipuma_dmb,
    write_ply,
)
from diner_tpu.fusion.fusion import fake_normals, probability_filter


def _plane_scene(V=3, H=24, W=32, z0=2.0, noise=0.0, seed=0):
    """Fronto-parallel plane at z=z0 seen by V cameras offset along x."""
    rng = np.random.RandomState(seed)
    f = 40.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    depths, normals, Ps, focals, colors = [], [], [], [], []
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.05 * v  # small x-translation
        P = (K @ E[:3]).astype(np.float32)
        # depth of plane z=z0 in this camera: z' = z0 (pure x translation)
        d = np.full((H, W), z0, np.float32)
        if noise:
            d += rng.randn(H, W).astype(np.float32) * noise
        n = np.zeros((H, W, 3), np.float32)
        n[..., 2] = -1.0
        depths.append(d)
        normals.append(n)
        Ps.append(P)
        focals.append(f)
        colors.append(np.full((H, W, 3), 0.5, np.float32))
    return (np.stack(depths), np.stack(normals), np.stack(Ps),
            np.asarray(focals, np.float32), np.stack(colors))


def test_build_library():
    lib = build_library()
    assert lib.exists()


def test_fuse_consistent_plane():
    depths, normals, P, focals, colors = _plane_scene()
    pts = fuse_depth_maps(depths, normals, P, focals, colors,
                          disp_thresh=0.25, normal_thresh=0.52,
                          num_consistent=2)
    assert len(pts) > 0
    # points lie on the plane z = 2
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-3)
    # normals preserved, colors averaged
    np.testing.assert_allclose(pts[:, 5], -1.0, atol=1e-3)
    np.testing.assert_allclose(pts[:, 6], 0.5, atol=1e-3)
    assert (pts[:, 9] >= 2).all()


def test_fuse_rejects_inconsistent_depth():
    depths, normals, P, focals, _ = _plane_scene()
    # corrupt all non-reference views massively → nothing consistent
    depths[1:] += 1.0
    pts = fuse_depth_maps(depths, normals, P, focals,
                          disp_thresh=0.1, normal_thresh=0.52,
                          num_consistent=2)
    assert len(pts) == 0


def test_fuse_normal_threshold():
    depths, normals, P, focals, _ = _plane_scene()
    # give every view a different normal so all PAIRS disagree (fusion
    # iterates each view as reference, so src views that merely differ from
    # view 0 can still be mutually consistent)
    flipped = normals.copy()
    flipped[0] = [0.0, 0.0, -1.0]
    flipped[1] = [1.0, 0.0, 0.0]
    flipped[2] = [0.0, 1.0, 0.0]
    pts = fuse_depth_maps(depths, flipped, P, focals,
                          disp_thresh=0.25, normal_thresh=0.5,
                          num_consistent=1)
    assert len(pts) == 0
    pts = fuse_depth_maps(depths, normals, P, focals,
                          disp_thresh=0.25, normal_thresh=0.5,
                          num_consistent=1)
    assert len(pts) > 0


def test_invalid_depth_skipped():
    depths, normals, P, focals, _ = _plane_scene()
    depths[0, :10] = 0.0  # invalid rows in the first view
    pts_full = fuse_depth_maps(depths * 0 + 2.0, normals, P, focals,
                               num_consistent=2)
    pts = fuse_depth_maps(depths, normals, P, focals, num_consistent=2)
    assert len(pts) < len(pts_full)


def test_dmb_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    img = rng.rand(10, 14).astype(np.float32)
    p = tmp_path / "t.dmb"
    write_gipuma_dmb(p, img)
    out = read_gipuma_dmb(p)
    np.testing.assert_allclose(out, img)
    img3 = rng.rand(6, 8, 3).astype(np.float32)
    write_gipuma_dmb(p, img3)
    np.testing.assert_allclose(read_gipuma_dmb(p), img3)


def test_probability_filter_and_fake_normals():
    d = np.ones((4, 4), np.float32)
    prob = np.array([[0.1, 0.9], [0.5, 0.3]], np.float32).repeat(2, 0).repeat(2, 1)
    out = probability_filter(d, prob, 0.4)
    assert (out == 0).sum() == 8
    n = fake_normals(out)
    assert n.shape == (4, 4, 3)
    np.testing.assert_allclose(np.linalg.norm(n[out > 0], axis=-1), 1.0,
                               atol=1e-5)
    assert (n[out == 0] == 0).all()


def test_write_ply(tmp_path):
    depths, normals, P, focals, colors = _plane_scene()
    pts = fuse_depth_maps(depths, normals, P, focals, colors,
                          num_consistent=1)
    ply = tmp_path / "cloud.ply"
    write_ply(ply, pts)
    head = ply.read_bytes()[:200].decode(errors="ignore")
    assert "element vertex" in head
    assert f"element vertex {len(pts)}" in head
    assert ply.stat().st_size > len(pts) * 27  # 6 floats + 3 uchar
