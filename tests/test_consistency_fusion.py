"""Reprojection-consistency filter tests: a consistent plane passes, a
corrupted source view fails, fused points land on the plane."""

import numpy as np

from diner_tpu.fusion.consistency import (
    check_geometric_consistency,
    filter_and_fuse,
)


def _plane_views(z0=2.0, H=20, W=24, n=3):
    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]])
    depths, Ks, Es = [], [], []
    for i in range(n):
        E = np.eye(4)
        E[0, 3] = 0.05 * i
        depths.append(np.full((H, W), z0, np.float32))
        Ks.append(K)
        Es.append(E)
    return depths, Ks, Es


def test_consistent_plane_passes():
    depths, Ks, Es = _plane_views()
    mask, d_rep = check_geometric_consistency(
        depths[0], Ks[0], Es[0], depths[1], Ks[1], Es[1])
    # interior pixels (whose source projection stays in-bounds) pass
    assert mask[5:-5, 5:-5].mean() > 0.95
    np.testing.assert_allclose(d_rep[mask], 2.0, atol=1e-4)


def test_inconsistent_depth_fails():
    depths, Ks, Es = _plane_views()
    depths[1] = depths[1] + 0.5  # 25% relative error
    mask, _ = check_geometric_consistency(
        depths[0], Ks[0], Es[0], depths[1], Ks[1], Es[1])
    assert mask.mean() < 0.05


def test_filter_and_fuse_plane():
    depths, Ks, Es = _plane_views(n=4)
    conf = [np.ones_like(d) for d in depths]
    imgs = [np.full(d.shape + (3,), 0.5, np.float32) for d in depths]
    pairs = [(0, [1, 2, 3]), (1, [0, 2, 3])]
    pts, colors, masks = filter_and_fuse(depths, conf, Ks, Es, pairs,
                                         images=imgs, conf_thresh=0.5,
                                         thres_view=3)
    assert len(pts) > 0
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-3)
    np.testing.assert_allclose(colors, 0.5)
    # low confidence kills everything
    conf0 = [np.zeros_like(d) for d in depths]
    pts0, _, _ = filter_and_fuse(depths, conf0, Ks, Es, pairs,
                                 conf_thresh=0.5, thres_view=3)
    assert len(pts0) == 0


def test_dynamic_fusion_plane():
    from diner_tpu.fusion.consistency import filter_and_fuse_dynamic

    depths, Ks, Es = _plane_views(n=4)
    conf = [np.ones_like(d) for d in depths]
    pairs = [(0, [1, 2, 3])]
    pts, _, masks = filter_and_fuse_dynamic(depths, conf, Ks, Es, pairs,
                                            photo_threshold=0.5,
                                            thres_view=3)
    assert len(pts) > 0
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-3)
    # dynamic thresholds accept slightly-noisy views the strict filter kills
    depths_noisy = [d.copy() for d in depths]
    for d in depths_noisy[1:]:
        d += np.random.RandomState(0).randn(*d.shape).astype(np.float32) \
            * 0.004  # 0.2% of depth: > 1%/i strict... within level bands
    pts2, _, _ = filter_and_fuse_dynamic(depths_noisy, conf, Ks, Es, pairs,
                                         photo_threshold=0.5, thres_view=3)
    assert len(pts2) > 0
