"""Multiface loader tests on a generated fixture tree."""

import json

import numpy as np
from PIL import Image

from diner_tpu.data.io import write_depth_png
from diner_tpu.data.multiface import (
    MultifaceDataset,
    gamma_correct,
    generate_metas,
    load_krt,
)
from diner_tpu.geometry.cam_paths import (
    TransSlerp,
    get_ray_intersections,
    pose_spherical,
)


def test_gamma_correct_matches_reference_formula():
    img = np.array([[[0.1, 0.5, 0.9]]], np.float32)
    out = gamma_correct(img)
    scale = np.array([1.4, 1.1, 1.6]) / 1.1
    expect = np.clip(
        ((1 / (1 - 3 / 255)) * 0.95 *
         np.clip(img * scale - 3 / 255, 0, 2)) ** 0.5 - 15 / 255, 0, 2)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def _krt_text(cams):
    lines = []
    for name, (K, E) in cams.items():
        lines.append(name)
        for row in K:
            lines.append(" ".join(str(v) for v in row))
        lines.append("0 0 0 0 0")
        for row in E[:3]:
            lines.append(" ".join(str(v) for v in row))
        lines.append("")
    return "\n".join(lines) + "\n"


def _ring_cameras(n=8, radius=900.0):
    """Cameras on a ring around (0, 0, 1000) looking at it (mm units)."""
    cams = {}
    target = np.array([0, 0, 1000.0])
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = target + radius * np.array([np.sin(a), 0.1, -np.cos(a)])
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])
        t = -R @ eye
        E = np.hstack([R, t[:, None]])
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        cams[f"40000{i}"] = (K, E)
    return cams


def test_load_krt_roundtrip(tmp_path):
    cams = _ring_cameras(3)
    p = tmp_path / "KRT"
    p.write_text(_krt_text(cams))
    out = load_krt(p)
    assert set(out) == set(cams)
    for name in cams:
        np.testing.assert_allclose(out[name]["intrin"], cams[name][0],
                                   atol=1e-5)
        np.testing.assert_allclose(out[name]["extrin"], cams[name][1],
                                   atol=1e-5)


def _write_multiface_fixture(tmp_path, H=64, W=64):
    rng = np.random.RandomState(0)
    root = tmp_path / "multiface"
    subj = "m--20200101--0000--123--GHS"
    seq = "SEQ1"
    # 16 cameras so that non-reference views survive the frustum filter
    cams = _ring_cameras(16)
    (root / subj).mkdir(parents=True)
    (root / subj / "KRT").write_text(_krt_text(cams))
    for cam in cams:
        for kind in ("images", "masks", "depths"):
            (root / subj / kind / seq / cam).mkdir(parents=True)
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / subj / "images" / seq / cam /
                                  "000001.png")
        mask = np.full((H, W), 255, np.uint8)
        mask[:8] = 0
        Image.fromarray(mask).save(root / subj / "masks" / seq / cam /
                                   "000001.png")
        write_depth_png(root / subj / "depths" / seq / cam / "000001.png",
                        rng.rand(H, W).astype(np.float32) * 0.5 + 0.7)

    split = {
        "train": {"subjects": [subj], "sequences": [seq],
                  "ref_centers": [[0, 90, 100], [630, 90, 360],
                                  [0, 90, 1900], [-630, 90, 360],
                                  [880, 90, 820], [-880, 90, 820]]},
        "val": {"subjects": [subj], "sequences": [seq],
                "ref_centers": [[0, 90, 100], [630, 90, 360],
                                [0, 90, 1900], [-630, 90, 360],
                                [880, 90, 820], [-880, 90, 820]]},
    }
    split_path = tmp_path / "split.json"
    split_path.write_text(json.dumps(split))
    return root, split_path


def test_multiface_dataset(tmp_path):
    root, split = _write_multiface_fixture(tmp_path)
    ds = MultifaceDataset(root, "train", split_config=split, downsample=2,
                          meta_dir=tmp_path / "meta_cache")
    assert len(ds) > 0
    s = ds[0]
    H, W = s["target_rgb"].shape[:2]
    assert H % 32 == 0 and W % 32 == 0
    assert s["src_rgbs"].shape[0] == len(ds.metas[0]["ref_ids"][2:])
    assert s["src_depths"].shape == s["src_depth_stds"].shape
    # extrinsics translation converted mm -> m
    assert np.abs(s["src_extrinsics"][:, :3, 3]).max() < 10.0
    # white background under alpha < 1 (bilinear resize blends only the
    # mask boundary row, as in the reference's whiten-then-resize order)
    masked = s["target_rgb"][s["target_alpha"][..., 0] < 1]
    assert masked.mean() > 0.95
    # std = 1e-3 where depth valid, 0 where invalid
    valid = s["src_depths"] > 0
    np.testing.assert_allclose(s["src_depth_stds"][valid], 1e-3)

    # meta cache reused
    ds2 = MultifaceDataset(root, "train", split_config=split, downsample=2,
                           meta_dir=tmp_path / "meta_cache")
    assert len(ds2) == len(ds)

    sweep = ds.get_cam_sweep_extrinsics(5, 0)
    assert sweep.shape == (5, 4, 4)
    for E in sweep:
        np.testing.assert_allclose(E[:3, :3] @ E[:3, :3].T, np.eye(3),
                                   atol=1e-5)


def test_cam_path_utils():
    # TransSlerp endpoints + clamping (reference __main__ check)
    ts = TransSlerp(np.array([0.0, 1.0]),
                    np.array([[1.0, 0, 0], [0, 1.0, 0]]))
    out = ts(np.array([-0.1, 0.0, 0.5, 1.0, 1.1]))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.5, 0.5, 0], atol=1e-6)
    np.testing.assert_allclose(out[4], [0, 1, 0], atol=1e-6)

    # ray intersection: crossing rays meet at the known point
    p1, p2 = get_ray_intersections(np.array([1, 0, 0, -1, 0, 0.0]),
                                   np.array([0, -1, 0, 0, 1.0, 0]))
    np.testing.assert_allclose(p1, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(p2, [0, 0, 0], atol=1e-6)

    pose = pose_spherical(30.0, -20.0, 2.0)
    assert pose.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 2.0, atol=1e-5)
