"""Data-layer tests against generated on-disk fixtures mirroring the DTU and
Facescape directory protocols (path construction, codecs, constants)."""

import json

import numpy as np
import pytest
from PIL import Image

from diner_tpu.data.io import (
    read_pfm,
    write_pfm,
    read_depth_png,
    write_depth_png,
    resize_nearest,
)
from diner_tpu.data.loader import DataLoader, collate


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(20, 30).astype(np.float32) * 5
    p = tmp_path / "d.pfm"
    write_pfm(p, img)
    out, scale = read_pfm(p)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_depth_png_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    d = rng.rand(16, 20).astype(np.float32) * 3  # meters
    p = tmp_path / "d.png"
    write_depth_png(p, d)
    out = read_depth_png(p)
    np.testing.assert_allclose(out, d, atol=1e-4)


def test_resize_nearest_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(2)
    x = rng.rand(15, 21).astype(np.float32)
    ours = resize_nearest(x, 7, 10)
    ref = F.interpolate(torch.from_numpy(x)[None, None], (7, 10),
                        mode="nearest")[0, 0].numpy()
    np.testing.assert_array_equal(ours, ref)


# ------------------------------------------------------------ DTU fixture

def _write_dtu_fixture(root, n_cams=36, H=512, W=640):
    """Minimal DTU tree: cam files for all cams, images/depths for the cams
    one sample needs (target cam index 0 + sources [30, 10, 6, 35])."""
    rng = np.random.RandomState(3)
    (root / "Cameras/train").mkdir(parents=True)
    for i in range(n_cams):
        K = np.array([[361.5, 0, 82.9], [0, 361.5, 66.4], [0, 0, 1]])
        E = np.eye(4)
        E[:3, 3] = [0.1 * i, 0, 600]
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
        lines += ["", "425.0 2.5"]
        (root / "Cameras/train" / f"{i:08d}_cam.txt").write_text(
            "\n".join(lines) + "\n")

    scan = "scan1"
    (root / "Rectified" / f"{scan}_train").mkdir(parents=True)
    (root / "Depths" / scan).mkdir(parents=True)
    used = [0, 30, 10, 6, 35]
    for cid in used:
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / "Rectified" / f"{scan}_train" /
            f"rect_{cid + 1:03d}_0_r5000.png")
    for cid in used[1:]:
        depth_m = rng.rand(H, W).astype(np.float32) * 0.5 + 0.3
        write_depth_png(root / "Depths" / scan /
                        f"depth_map_{cid:04d}_TransMVSNet.png", depth_m)
        conf = rng.rand(H, W).astype(np.float32)
        write_depth_png(root / "Depths" / scan /
                        f"depth_map_{cid:04d}_TransMVSNet_conf.png", conf)
    return scan


def test_dtu_dataset(tmp_path):
    from diner_tpu.data.dtu import DTUDataset, DTU_SCALE_FACTOR

    root = tmp_path / "DTU"
    root.mkdir()
    _write_dtu_fixture(root)
    split_dir = tmp_path / "splits"
    split_dir.mkdir()
    (split_dir / "dtu_train_all.txt").write_text("scan1\n")

    ds = DTUDataset(root, "train", split_dir=split_dir)
    assert len(ds) == 1 * 36 * 7
    np.testing.assert_allclose(ds.znear, 400 * DTU_SCALE_FACTOR)
    np.testing.assert_allclose(ds.zfar, 1500 * DTU_SCALE_FACTOR)

    s = ds[0]  # scan1, cam 0, light 0
    assert s["target_rgb"].shape == (256, 320, 3)
    assert s["src_rgbs"].shape == (4, 256, 320, 3)
    assert s["src_depths"].shape == (4, 256, 320, 1)
    assert s["src_depth_stds"].shape == (4, 256, 320, 1)
    assert s["src_extrinsics"].shape == (4, 4, 4)
    assert list(s["src_view_ids"]) == [30, 10, 6, 35]
    assert s["sample_name"] == "scan1-0"
    # intrinsics: x4 (quarter-res cam files) then x0.5 downsample
    np.testing.assert_allclose(s["target_intrinsics"][0, 0], 361.5 * 4 * 0.5)
    # extrinsics translation scaled to Facescape world units
    np.testing.assert_allclose(s["src_extrinsics"][0, 2, 3],
                               600 * DTU_SCALE_FACTOR, rtol=1e-5)
    # depth scaled: raw meters / (0.7/872) * scale_factor = raw meters
    assert 0.2 < s["src_depths"].mean() < 0.7
    ds.check_depth_existence()  # must not raise

    sweep = ds.get_cam_sweep_extrinsics(5)
    assert sweep.shape == (5, 4, 4)
    # valid rigid transforms
    for E in sweep:
        R = E[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_dtu_camera_holdout(tmp_path):
    """exclude_cams / only_cams split target cameras disjointly (single-scan
    novel-view protocol; the reference splits by scan, dtu.py:130-140)."""
    from diner_tpu.data.dtu import DTUDataset

    root = tmp_path / "DTU"
    root.mkdir()
    _write_dtu_fixture(root)
    split_dir = tmp_path / "splits"
    split_dir.mkdir()
    for st in ("train", "val"):
        (split_dir / f"dtu_{st}_all.txt").write_text("scan1\n")

    held = [0, 5, 12]
    tr = DTUDataset(root, "train", split_dir=split_dir, exclude_cams=held)
    va = DTUDataset(root, "val", split_dir=split_dir, only_cams=held)
    assert len(tr) == (36 - 3) * 7 and len(va) == 3 * 7
    assert not ({m["cam_idx"] for m in tr.metas}
                & {m["cam_idx"] for m in va.metas})
    assert {m["cam_idx"] for m in va.metas} == set(held)
    # sources stay available as inputs regardless of the target holdout
    s = va[0]
    assert list(s["src_view_ids"]) == [30, 10, 6, 35]
    with pytest.raises(ValueError):
        DTUDataset(root, "val", split_dir=split_dir, exclude_cams=[1],
                   only_cams=[2])


def test_dtu_conf2std_affine():
    from diner_tpu.data.dtu import conf2std
    np.testing.assert_allclose(conf2std(np.float32(1.0)),
                               -2.5679e-2 + 3.2818e-2, rtol=1e-5)


# ------------------------------------------------------- Facescape fixture

def _write_facescape_fixture(tmp_path, H=64, W=64):
    rng = np.random.RandomState(4)
    root = tmp_path / "facescape"
    scan = root / "subj01" / "frame001"
    cams = {}
    for vid in ["1", "2", "3"]:
        vdir = scan / f"view_{int(vid):05d}"
        vdir.mkdir(parents=True)
        rgba = (rng.rand(H, W, 4) * 255).astype(np.uint8)
        rgba[..., 3] = 255
        rgba[:10, :, 3] = 0  # transparent strip
        Image.fromarray(rgba).save(vdir / "rgba_colorcalib_v2.png")
        depth = (rng.rand(H, W) * 2 * 1e4).astype(np.uint16)
        trip = np.concatenate([depth, depth, (rng.rand(H, W) * 1e4
                                              ).astype(np.uint16)], axis=1)
        Image.fromarray(trip).save(vdir / "depth_gt_pred_conf.png")
        Image.fromarray(depth).save(vdir / "depth_mesh.png")
        cams[vid] = {
            "extrinsics": np.hstack([np.eye(3), [[0], [0], [float(vid)]]]
                                    ).tolist(),
            "intrinsics": [[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]],
        }
    with open(scan / "cameras.json", "w") as f:
        json.dump(cams, f)

    split_dir = tmp_path / "fs_splits"
    split_dir.mkdir()
    metas = [{"scan_path": "subj01/frame001",
              "targets": ["1"], "l_refs": ["2"], "r_refs": ["3"],
              "targets_val": ["1"], "l_refs_val": ["2"],
              "r_refs_val": ["3"]}]
    (split_dir / "train_metas_binocular.txt").write_text(json.dumps(metas))
    (split_dir / "val_metas_binocular.txt").write_text(json.dumps(metas))
    return root, split_dir


def test_facescape_dataset(tmp_path):
    from diner_tpu.data.facescape import FacescapeDataset

    root, split_dir = _write_facescape_fixture(tmp_path)
    ds = FacescapeDataset(root, "train", split_dir=split_dir)
    assert len(ds) == 5  # 1 meta x 5 repeats
    s = ds[0]
    assert s["target_rgb"].shape == (64, 64, 3)
    assert s["src_rgbs"].shape == (2, 64, 64, 3)
    assert s["src_depths"].shape == (2, 64, 64, 1)
    # background forced to white under alpha < .5
    assert (s["target_rgb"][:5] == 1.0).all()
    assert list(s["src_view_ids"]) == [2, 3]
    assert s["src_extrinsics"].shape == (2, 4, 4)
    np.testing.assert_allclose(s["src_extrinsics"][0, 3], [0, 0, 0, 1])

    ds_val = FacescapeDataset(root, "val", split_dir=split_dir)
    assert len(ds_val) == 20  # 1 meta x 20 repeats


def test_facescape_depth_types(tmp_path):
    from diner_tpu.data.facescape import read_depth_triptych

    root, _ = _write_facescape_fixture(tmp_path)
    vdir = root / "subj01" / "frame001" / "view_00001"
    d0, c0 = read_depth_triptych(vdir / "depth_gt_pred_conf.png",
                                 vdir / "depth_mesh.png", "original")
    dm, cm = read_depth_triptych(vdir / "depth_gt_pred_conf.png",
                                 vdir / "depth_mesh.png", "mesh")
    dg, cg = read_depth_triptych(vdir / "depth_gt_pred_conf.png",
                                 vdir / "depth_mesh.png", "merge")
    assert d0.shape == dm.shape == dg.shape == (64, 64, 1)
    assert set(np.unique(cm)) <= {0.0, np.float32(0.8)}


def test_dataloader_prefetch_and_collate():
    class ToyDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32), "name": f"s{i}"}

    dl = DataLoader(ToyDS(), batch_size=4, shuffle=True, num_workers=2,
                    seed=0)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 2, 2)
    assert isinstance(batches[0]["name"], list)
    seen = sorted(int(b) for batch in batches for b in batch["x"][:, 0, 0])
    assert seen == list(range(10))
    # epoch reshuffle changes order
    order1 = [b["x"][:, 0, 0].tolist() for b in DataLoader(
        ToyDS(), 4, shuffle=True, num_workers=0, seed=0)]
    dl2 = DataLoader(ToyDS(), 4, shuffle=True, num_workers=0, seed=0)
    _ = list(dl2)
    order2 = [b["x"][:, 0, 0].tolist() for b in dl2]
    assert order1 != order2


def test_facescape_cam_sweep(tmp_path):
    """Sweep cameras sit on a radius-r arc about world z, looking at the
    origin with world -z as image down (facescape.py:365-424)."""
    from diner_tpu.data.facescape import FacescapeDataset

    root, split_dir = _write_facescape_fixture(tmp_path)

    class _OffAxis(FacescapeDataset):
        # the shared fixture's cameras sit on the z axis, which is the
        # sweep's singular direction; substitute a realistic binocular rig
        def __getitem__(self, idx):
            s = super().__getitem__(idx)
            extr = []
            for ang in (-0.3, 0.3):
                R = np.array([[np.cos(ang), -np.sin(ang), 0],
                              [np.sin(ang), np.cos(ang), 0],
                              [0, 0, 1.0]])
                c = R @ np.array([0.0, -1.6, 0.2])
                E = np.eye(4)
                E[:3, :3] = R
                E[:3, 3] = -R @ c  # world→cam: t = -R c
                extr.append(E)
            s["src_extrinsics"] = np.stack(extr).astype(np.float32)
            return s

    ds = _OffAxis(root, "val", split_dir=split_dir)
    nframes, radius, sweep = 7, 1.8, 45.0
    extr = ds.get_cam_sweep_extrinsics(nframes, 0, radius=radius,
                                       sweep_range=sweep)
    assert extr.shape == (nframes, 4, 4)
    poses = np.linalg.inv(extr.astype(np.float64))
    centers = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), radius,
                               rtol=1e-5)
    # optical axis (z column) points from the camera to the origin
    z_cols = poses[:, :3, 2]
    np.testing.assert_allclose(z_cols, -centers / radius, atol=1e-5)
    # y column is world -z (image down)
    np.testing.assert_allclose(poses[:, :3, 1],
                               np.tile([0, 0, -1.0], (nframes, 1)),
                               atol=1e-6)
    # first↔last arc angle = 2 * sweep_range (rotation about world z)
    c0 = centers[0] / radius
    c1 = centers[-1] / radius
    cos = np.dot(c0, c1)
    # both are unit; the rotation is about z so compare azimuthal angle
    a0 = np.arctan2(c0[1], c0[0])
    a1 = np.arctan2(c1[1], c1[0])
    dag = np.degrees((a1 - a0 + np.pi) % (2 * np.pi) - np.pi)
    assert abs(abs(dag) - 2 * sweep) < 1e-4
    # middle frame aligns with the mean source direction (alpha = 0)
    s = ds[0]
    se = np.asarray(s["src_extrinsics"], np.float64)
    sc = -np.einsum("nji,njk->nik", se[:, :3, :3], se[:, :3, 3:])[..., 0]
    sd = sc / np.linalg.norm(sc, axis=-1, keepdims=True)
    md = sd.sum(0)
    md /= np.linalg.norm(md)
    np.testing.assert_allclose(centers[nframes // 2] / radius, md,
                               atol=1e-5)


def test_collate_nested_dicts():
    from diner_tpu.data.loader import collate

    s = {"a": np.ones((2, 3)), "pyr": {"s1": np.zeros((4,)),
                                       "s2": np.ones((8,))},
         "name": "x", "scalar": 1.5}
    b = collate([s, s])
    assert b["a"].shape == (2, 2, 3)
    assert b["pyr"]["s1"].shape == (2, 4)
    assert b["pyr"]["s2"].shape == (2, 8)
    assert b["name"] == ["x", "x"]
    np.testing.assert_allclose(b["scalar"], [1.5, 1.5])
