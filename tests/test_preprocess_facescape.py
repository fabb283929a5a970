"""End-to-end test of the facescape preprocessing pipeline on a synthetic
raw subject (params.json + PLY scan + models_reg OBJ)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from diner_tpu.preprocessing.facescape_pipeline import (
    get_cam_angles,
    inv_extrinsics,
    load_ply,
    silhouette_crop_bbx,
    to_homogeneous_trafo,
    undistort_image,
)


def _write_subject(tmp_path):
    raw = tmp_path / "RAW" / "1"
    pose = raw / "1_neutral"
    pose.mkdir(parents=True)
    (raw / "models_reg").mkdir()

    K = [[40.0, 0.0, 16.0], [0.0, 40.0, 12.0], [0.0, 0.0, 1.0]]
    cam = {
        "0_K": K,
        "0_Rt": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]],
        "0_distortion": [0.0, 0.0, 0.0, 0.0, 0.0],
        "0_width": 32,
        "0_height": 24,
        "0_valid": True,
    }
    (pose / "params.json").write_text(json.dumps(cam))
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(
        pose / "0.jpg")

    # ascii PLY quad at z = 1000 mm spanning x,y ∈ [-200, 200] mm
    ply = ["ply", "format ascii 1.0", "element vertex 5",
           "property float x", "property float y", "property float z",
           "element face 4", "property list uchar int vertex_indices",
           "end_header",
           "-200 -200 1000", "200 -200 1000", "200 200 1000",
           "-200 200 1000", "0 0 1000",
           "3 0 1 4", "3 1 2 4", "3 2 3 4", "3 3 0 4"]
    (raw / "1_neutral.ply").write_text("\n".join(ply) + "\n")
    (raw / "models_reg" / "1_neutral.obj").write_text(
        "v -200 -200 1000\nv 200 200 1000\nv 0 0 1000\nf 1 2 3\n")

    rt_scale = tmp_path / "Rt_scale_dict.json"
    rt_scale.write_text(json.dumps(
        {"1": {"1": [1.0, [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]]}}))
    lmk = tmp_path / "landmark_indices.npz"
    np.savez(lmk, v10=np.array([0, 1, 2]))
    return raw, rt_scale, lmk


def test_pure_helpers():
    E = to_homogeneous_trafo(np.array(
        [[[1, 0, 0, 2.0], [0, 1, 0, 3.0], [0, 0, 1, 4.0]]]))
    assert E.shape == (1, 4, 4) and E[0, 3, 3] == 1
    back = inv_extrinsics(inv_extrinsics(E))
    np.testing.assert_allclose(back, E, atol=1e-12)

    Rt = np.array([[1.0, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0]])
    ang = get_cam_angles(Rt)  # viewdir = +y (capstudio frontal)
    assert abs(ang["azimuth"]) < 1e-6 and abs(ang["elevation"]) < 1e-6

    # zero distortion → identity resample
    rng = np.random.RandomState(0)
    img = rng.rand(24, 32, 3)
    K = np.array([[40.0, 0, 16], [0, 40, 12], [0, 0, 1]])
    out = undistort_image(img, K, np.zeros(5))
    np.testing.assert_allclose(out, img, atol=1e-9)

    mask = np.zeros((24, 32), bool)
    mask[6:18, 10:22] = True
    t, b, l, r = silhouette_crop_bbx(mask, cam_center_x=1.0)
    assert (b - t) == 24 and (r - l) == 24  # square, crop_in = min(h, w)
    t2, b2, l2, r2 = silhouette_crop_bbx(mask, cam_center_x=-1.0)
    assert (b2 - t2) == 24 and (r2 - l2) == 24


def test_load_ply_binary(tmp_path):
    verts = np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1]], np.float32)
    p = tmp_path / "m.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\nproperty float x\nproperty float y\n"
                b"property float z\nelement face 1\n"
                b"property list uchar int vertex_indices\nend_header\n")
        verts.astype("<f4").tofile(f)
        f.write(bytes([3]))
        np.array([0, 1, 2], "<i4").tofile(f)
    v, fa = load_ply(p)
    np.testing.assert_allclose(v, verts)
    assert fa.tolist() == [[0, 1, 2]]


@pytest.mark.slow
def test_preprocess_facescape_end_to_end(tmp_path):
    raw, rt_scale, lmk = _write_subject(tmp_path)
    out = tmp_path / "OUT" / "001"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "preprocess_facescape.py"),
         "--dir_in", str(raw), "--dir_out", str(out),
         "--rt_scale", str(rt_scale), "--landmarks", str(lmk),
         "--crop_out", "16"],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr
    assert "1_neutral: ok" in r.stdout, r.stdout

    scan = out / "01"
    view = scan / "view_00000"
    rgba = np.asarray(Image.open(view / "rgba.png"))
    assert rgba.shape == (16, 16, 4)
    depth = np.asarray(Image.open(view / "depth.png")).astype(np.float32)
    # quad at 1000 mm → 1.0 m → uint16 10000 (×1e-4 m codec)
    fg = depth > 0
    assert fg.any()
    np.testing.assert_allclose(depth[fg] * 1e-4, 1.0, atol=1e-3)
    # alpha matches depth validity
    np.testing.assert_array_equal(rgba[..., 3] > 0, fg)

    cams = json.loads((scan / "cameras.json").read_text())
    assert "0" in cams and "angles" in cams["0"]
    K = np.asarray(cams["0"]["intrinsics"])
    np.testing.assert_allclose(K[0, 0], 40.0 * 16 / 24, rtol=1e-12)

    lmks = np.loadtxt(scan / "3dlmks.npy")
    assert lmks.shape == (3, 3)
    # capstudio convention: y_raw → z, mm → m
    np.testing.assert_allclose(lmks[0], [-0.2, -1.0, -0.2], atol=1e-6)

    # color calibration wrote the corrected image (single camera → l1 = 0)
    assert (view / "rgba_colorcalib.png").exists()
