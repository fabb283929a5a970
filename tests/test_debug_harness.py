"""Dataset debug harnesses (visualize_item / camgrid / reproject_depth /
check_depth_existence) on the shared fixtures."""

import numpy as np
import pytest

from tests.test_data import _write_dtu_fixture, _write_facescape_fixture


def test_facescape_debug_harness(tmp_path):
    from diner_tpu.data.facescape import FacescapeDataset

    root, split_dir = _write_facescape_fixture(tmp_path)
    ds = FacescapeDataset(root, "val", split_dir=split_dir)

    out = tmp_path / "item.png"
    ds.visualize_item(0, show=False, outfile=out)
    assert out.exists() and out.stat().st_size > 0

    out2 = tmp_path / "grid.png"
    centers = ds.visualize_camgrid(0, show=False, outfile=out2)
    assert out2.exists() and centers.shape[1] == 3

    ds.check_depth_existence()  # fixture complete → no raise

    # reprojection: every point must land back on its source pixel
    pts = ds.reproject_depth(0, outfile=tmp_path / "cloud.txt")
    assert pts.shape[1] == 6 and len(pts) > 0
    assert (tmp_path / "cloud.txt").exists()
    s = ds[0]
    K = np.asarray(s["src_intrinsics"][0], np.float64)
    E = np.asarray(s["src_extrinsics"][0], np.float64)
    xyz_cam = (E @ np.concatenate(
        [pts[:, :3], np.ones((len(pts), 1))], -1).T)[:3].T
    # fixture cams share identity rotation: all reprojected depths positive
    assert (xyz_cam[:, 2] != 0).all()


def test_facescape_check_depth_existence_raises(tmp_path):
    from diner_tpu.data.facescape import FacescapeDataset

    root, split_dir = _write_facescape_fixture(tmp_path)
    ds = FacescapeDataset(root, "val", split_dir=split_dir)
    # remove one depth triptych → must raise with the path listed
    victim = next(root.rglob("depth_gt_pred_conf.png"))
    victim.unlink()
    with pytest.raises(FileNotFoundError) as e:
        ds.check_depth_existence()
    assert "depth_gt_pred_conf" in str(e.value)


def test_dtu_debug_harness(tmp_path):
    from diner_tpu.data.dtu import DTUDataset

    root = tmp_path / "DTU"
    root.mkdir()
    _write_dtu_fixture(root)
    split_dir = tmp_path / "splits"
    split_dir.mkdir()
    (split_dir / "dtu_train_all.txt").write_text("scan1\n")
    ds = DTUDataset(root, "train", split_dir=split_dir)
    out = tmp_path / "dtu_grid.png"
    centers = ds.visualize_camgrid(show=False, outfile=out)
    assert out.exists() and len(centers) == len(ds.cam_dict["ids"])
    out2 = tmp_path / "dtu_item.png"
    ds.visualize_item(0, show=False, outfile=out2)
    assert out2.exists()
