"""Tests for the general-eval / BlendedMVS MVS datasets + preprocess helpers.

Parity targets: deps/TransMVSNet/datasets/general_eval.py, bld_train.py,
preprocess.py.
"""

import numpy as np
import pytest
from PIL import Image

from diner_tpu.data.io import resize_bilinear, write_pfm
from diner_tpu.mvs.eval_datasets import (
    MVSBlendedDataset,
    MVSGeneralEvalDataset,
    center_img,
    crop_mvs_input,
    read_pair_file,
    scale_camera,
    scale_mvs_input,
)


def _write_cam(path, K, E, depth_line):
    lines = ["extrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in E]
    lines += ["", "intrinsic"]
    lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
    lines += ["", depth_line]
    path.write_text("\n".join(lines) + "\n")


def _write_pair(path, pairs):
    lines = [str(len(pairs))]
    for ref, srcs in pairs:
        lines.append(str(ref))
        lines.append(" ".join([str(len(srcs))] +
                              [f"{s} {100.0 - s}" for s in srcs]))
    path.write_text("\n".join(lines) + "\n")


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    img = rng.rand(37, 53, 3).astype(np.float32)
    out = resize_bilinear(img, 64, 96)
    ref = F.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None],
                        size=(64, 96), mode="bilinear",
                        align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_preprocess_helpers():
    K = np.array([[100.0, 0, 50], [0, 100, 40], [0, 0, 1]], np.float32)
    K2 = scale_camera(K, 0.5)
    assert K2[0, 0] == 50 and K2[1, 2] == 20 and K2[2, 2] == 1

    rng = np.random.RandomState(1)
    imgs = [rng.rand(30, 42, 3).astype(np.float32) for _ in range(2)]
    cams = [K.copy() for _ in range(2)]
    new_imgs, new_cams = scale_mvs_input(imgs, cams, scale=0.5, view_num=2)
    assert new_imgs.shape == (2, 15, 21, 3)
    assert new_cams[0][0, 0] == 50

    # crop to base-8 multiple, center crop, principal point shifted
    imgs = [rng.rand(33, 45, 3).astype(np.float32) for _ in range(2)]
    cams = [K.copy() for _ in range(2)]
    depth = rng.rand(33, 45).astype(np.float32)
    out_imgs, out_cams, out_depth = crop_mvs_input(
        imgs, cams, depth_image=depth, view_num=2, max_h=32, max_w=40)
    assert out_imgs.shape == (2, 32, 40, 3)
    assert out_depth.shape == (32, 40)
    assert out_cams[0][0, 2] == 50 - 3 and out_cams[0][1, 2] == 40 - 1

    c = center_img((rng.rand(8, 8, 3) * 10).astype(np.float32))
    np.testing.assert_allclose(c.mean(axis=(0, 1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(c.std(axis=(0, 1)), 1.0, atol=1e-3)


def _general_eval_fixture(tmp_path, depth_line):
    root = tmp_path / "scenes"
    scan = root / "scan1"
    (scan / "cams").mkdir(parents=True)
    (scan / "images").mkdir()
    _write_pair(scan / "pair.txt", [(0, [1, 2]), (1, [0, 2])])
    rng = np.random.RandomState(0)
    K = np.array([[800.0, 0, 400], [0, 800, 300], [0, 0, 1]], np.float32)
    for vid in range(3):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.1 * vid
        _write_cam(scan / "cams" / f"{vid:08d}_cam.txt", K, E, depth_line)
        img = (rng.rand(600, 800, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(scan / "images" / f"{vid:08d}.jpg")
    return root


def test_general_eval_dataset(tmp_path):
    root = _general_eval_fixture(tmp_path, "425.0 2.5")
    ds = MVSGeneralEvalDataset(root, ["scan1"], "test", nviews=3,
                               ndepths=48, max_h=512, max_w=640)
    assert len(ds) == 2
    s = ds[0]
    # 600×800 fits under (512? no: 600 > 512) → scaled by 512/600 then
    # floored to base 32: h = 512//32*32 = 512? scale=512/600 → w=682.6 > 640
    # → scale = 640/800 = 0.8 → (480, 640)
    assert s["imgs"].shape == (3, 480, 640, 3)
    assert s["depth_values"].shape == (48,)
    np.testing.assert_allclose(s["depth_values"][0], 425.0)
    np.testing.assert_allclose(np.diff(s["depth_values"]), 2.5 * 1.06,
                               rtol=2e-5)
    # intrinsics: /4 from file then ×0.8 resize
    np.testing.assert_allclose(s["proj_matrices"]["stage1"][0, 1, 0, 0],
                               800 / 4 * 0.8, rtol=1e-5)
    np.testing.assert_allclose(s["proj_matrices"]["stage3"][:, 1, :2],
                               4 * s["proj_matrices"]["stage1"][:, 1, :2])
    assert s["filename"] == "scan1/{}/00000000{}"


def test_general_eval_num_depth_field(tmp_path):
    # 3-field depth line: interval recomputed as span/ndepths then ×scale
    root = _general_eval_fixture(tmp_path, "425.0 2.5 192")
    ds = MVSGeneralEvalDataset(root, ["scan1"], "test", nviews=3,
                               ndepths=96, max_h=512, max_w=640,
                               interval_scale=1.0)
    s = ds[0]
    expected = (425.0 + 192 * 2.5 - 425.0) / 96
    np.testing.assert_allclose(np.diff(s["depth_values"]), expected,
                               rtol=1e-5)
    assert s["depth_values"].shape == (96,)


def test_blended_dataset(tmp_path):
    root = tmp_path / "bld"
    scan = root / "scene0"
    (scan / "cams").mkdir(parents=True)
    (scan / "blended_images").mkdir()
    (scan / "rendered_depth_maps").mkdir()
    _write_pair(scan / "cams" / "pair.txt", [(0, [1, 2]), (1, [0])])
    rng = np.random.RandomState(0)
    K = np.array([[400.0, 0, 200], [0, 400, 150], [0, 0, 1]], np.float32)
    for vid in range(3):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.1 * vid
        # BlendedMVS line: dmin interval ndepth dmax
        _write_cam(scan / "cams" / f"{vid:08d}_cam.txt", K, E,
                   "2.0 0.01 128 6.0")
        img = (rng.rand(128, 160, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(scan / "blended_images" / f"{vid:08d}.jpg")
        depth = (rng.rand(128, 160) * 5 + 1.5).astype(np.float32)
        write_pfm(scan / "rendered_depth_maps" / f"{vid:08d}.pfm", depth)
    listfile = tmp_path / "list.txt"
    listfile.write_text("scene0\n")

    ds = MVSBlendedDataset(root, listfile, "train", nviews=3, ndepths=64)
    # second pair has only 1 src view < nviews-1=2 → dropped
    assert len(ds) == 1
    s = ds[0]
    assert s["imgs"].shape == (3, 128, 160, 3)
    interval = (6.0 - 2.0) / 64
    np.testing.assert_allclose(s["depth_interval"], interval, rtol=1e-6)
    assert s["depth_values"].shape == (64,)
    np.testing.assert_allclose(s["depth_values"][0], 2.0)
    assert s["depth"]["stage1"].shape == (32, 40)
    assert s["mask"]["stage2"].shape == (64, 80)
    # mask marks depth within [dmin, dmin + 63*interval]
    d = s["depth"]["stage3"]
    expected_mask = ((d >= 2.0) & (d <= 2.0 + interval * 63)).astype(
        np.float32)
    np.testing.assert_array_equal(s["mask"]["stage3"], expected_mask)
    assert s["name"].endswith("rendered_depth_maps/00000000.pfm")


def test_read_pair_file(tmp_path):
    p = tmp_path / "pair.txt"
    _write_pair(p, [(3, [1, 5, 7])])
    pairs = read_pair_file(p)
    assert pairs == [(3, [1, 5, 7])]
