"""DTU camera-sweep parity against a torch re-statement of the reference's
slerp-around-triangulated-center construction (dtu.py:245-340)."""

import numpy as np
import torch

from tests.test_data import _write_dtu_fixture


def _torch_cam_sweep(extrinsics, nframes):
    """Re-statement of DTUDataSet.get_cam_sweep_extrinsics."""
    from scipy.spatial.transform import Rotation, Slerp

    def ray_intersections(r1, r2):
        B = (r2[:3] - r1[:3]).unsqueeze(1)
        A = torch.stack((r1[3:], -r2[3:]), dim=-1)
        t = torch.linalg.lstsq(A, B).solution.flatten()
        return r1[:3] + r1[3:] * t[0], r2[:3] + r2[3:] * t[1]

    center_extr = torch.from_numpy(extrinsics[24])
    left_extr = torch.from_numpy(extrinsics[11])
    right_extr = torch.from_numpy(extrinsics[18])
    center_pose = torch.linalg.inv(center_extr)
    left_pose = torch.linalg.inv(left_extr)
    right_pose = torch.linalg.inv(right_extr)

    def camray_z(p):
        # reference column -2 of the 4x4 pose == column 2 == viewing axis
        return torch.cat((p[:3, -1], p[:3, 2]))

    origin = torch.mean(torch.stack(
        ray_intersections(camray_z(left_pose), camray_z(center_pose))
        + ray_intersections(camray_z(center_pose), camray_z(right_pose))
        + ray_intersections(camray_z(left_pose), camray_z(right_pose))), 0)
    radius = (torch.norm(origin - left_pose[:3, -1])
              + torch.norm(origin - center_pose[:3, -1])
              + torch.norm(origin - right_pose[:3, -1])) / 3

    t = torch.linspace(0, 1, nframes)
    x1 = left_pose[:3, -1] - origin
    x2 = center_pose[:3, -1] - origin
    x3 = right_pose[:3, -1] - origin
    x1, x2, x3 = (v / torch.norm(v) for v in (x1, x2, x3))
    th1 = torch.acos(torch.clamp(x1 @ x2, -1, 1))
    th2 = torch.acos(torch.clamp(x2 @ x3, -1, 1))
    centers = torch.zeros(nframes, 3, dtype=torch.float64)
    first = t < 0.5
    t1 = t[first] * 2
    t2 = t[~first] * 2 - 1
    centers[first] = (torch.sin((1 - t1[:, None]) * th1) / torch.sin(th1) * x1
                      + torch.sin(t1[:, None] * th1) / torch.sin(th1) * x2)
    centers[~first] = (torch.sin((1 - t2[:, None]) * th2) / torch.sin(th2) * x2
                       + torch.sin(t2[:, None] * th2) / torch.sin(th2) * x3)
    centers = centers * radius + origin

    rots = Rotation.from_matrix(np.stack([left_pose[:3, :3].numpy(),
                                          center_pose[:3, :3].numpy(),
                                          right_pose[:3, :3].numpy()]))
    slerp = Slerp([0.0, 0.5, 1.0], rots)
    target_rots = slerp(t.numpy()).as_matrix()

    poses = np.tile(np.eye(4), (nframes, 1, 1))
    poses[:, :3, :3] = target_rots
    poses[:, :3, 3] = centers.numpy()
    return np.linalg.inv(poses)


def _look_at_extr(eye, target=(0.0, 0.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = -R @ eye
    return E


def test_dtu_cam_sweep_matches_reference(tmp_path):
    from diner_tpu.data.dtu import DTUDataset

    root = tmp_path / "DTU"
    root.mkdir()
    _write_dtu_fixture(root)
    split_dir = tmp_path / "splits"
    split_dir.mkdir()
    (split_dir / "dtu_train_all.txt").write_text("scan1\n")
    ds = DTUDataset(root, "train", split_dir=split_dir)

    # the fixture's identity-rotation cameras have parallel viewing rays
    # (degenerate triangulation); substitute a look-at arc like the DTU rig
    extr = ds.cam_dict["extrinsics"].copy()
    for i, ang in ((11, -0.5), (24, 0.0), (18, 0.5)):
        eye = np.array([1.5 * np.sin(ang), 0.3, -1.5 * np.cos(ang)])
        extr[i] = _look_at_extr(eye)
    ds.cam_dict["extrinsics"] = extr.astype(np.float32)

    ours = ds.get_cam_sweep_extrinsics(7)
    ref = _torch_cam_sweep(extr.astype(np.float64), 7)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)
