"""End-to-end test of the mvs_test fusion driver (scripts/mvs_test.py).

Builds the reference folder protocol (depth_est/confidence/cams/images) for
a synthetic two-plane scene whose depth maps are multi-view consistent, then
runs all three fusion backends and checks the PLYs.
"""

import struct
import sys
import types
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from diner_tpu.data.io import write_pfm


H, W = 48, 64


def _cams(n=3):
    """Views looking down +z from slightly shifted origins."""
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    Es = []
    for i in range(n):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.05 * i  # small baseline
        Es.append(E)
    return K, Es


def _consistent_depths(K, Es, plane_z=2.0):
    """Depth maps of the plane z=plane_z (world) seen from each view: since
    all views share orientation and the plane is fronto-parallel, depth =
    plane_z everywhere and reprojection is exactly consistent."""
    return [np.full((H, W), plane_z, np.float32) for _ in Es]


def _write_protocol(root, scan, K, Es, depths):
    scan_out = root / scan
    for sub in ("depth_est", "confidence", "cams", "images"):
        (scan_out / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for vid, (E, d) in enumerate(zip(Es, depths)):
        write_pfm(scan_out / "depth_est" / f"{vid:08d}.pfm", d)
        write_pfm(scan_out / "confidence" / f"{vid:08d}.pfm",
                  np.full((H, W), 0.99, np.float32))
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
        lines += ["", "1.0 0.01"]
        (scan_out / "cams" / f"{vid:08d}_cam.txt").write_text(
            "\n".join(lines) + "\n")
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(scan_out / "images" / f"{vid:08d}.jpg")


def _write_pair(path, n=3):
    lines = [str(n)]
    for r in range(n):
        srcs = [s for s in range(n) if s != r]
        lines.append(str(r))
        lines.append(" ".join([str(len(srcs))] +
                              [f"{s} {10.0 - s}" for s in srcs]))
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("\n".join(lines) + "\n")


def _ply_vertex_count(path):
    head = Path(path).read_bytes()[:200].decode("latin1")
    for line in head.splitlines():
        if line.startswith("element vertex"):
            return int(line.split()[-1])
    raise AssertionError("no vertex element")


@pytest.mark.parametrize("method", ["normal", "dynamic", "gipuma"])
def test_fuse_scan_backends(tmp_path, method):
    import mvs_test

    K, Es = _cams(3)
    depths = _consistent_depths(K, Es)
    testpath = tmp_path / "scenes"
    out_root = tmp_path / "out"
    _write_pair(testpath / "scan1" / "pair.txt", 3)
    _write_protocol(out_root, "scan1", K, Es, depths)

    args = types.SimpleNamespace(testpath=str(testpath),
                                 filter_method=method, conf=0.5,
                                 thres_view=2)
    if method == "gipuma":
        try:
            from diner_tpu.fusion.fusion import _load
            _load()
        except Exception as e:
            pytest.skip(f"native fusion lib unavailable: {e}")
    mvs_test._fuse_scan(args, "scan1", out_root)

    ply = out_root / "mvsnet_scan1.ply"
    assert ply.exists()
    n = _ply_vertex_count(ply)
    # the plane is fully consistent across all 3 views → nearly every pixel
    # of every reference view survives
    assert n > 0.5 * H * W


def test_fuse_scan_rejects_inconsistent(tmp_path):
    import mvs_test

    K, Es = _cams(3)
    depths = _consistent_depths(K, Es)
    # corrupt view 0's depth → its pixels fail geometric consistency
    depths[0] = depths[0] + np.linspace(0, 1, W)[None, :].astype(np.float32)
    testpath = tmp_path / "scenes"
    out_root = tmp_path / "out"
    _write_pair(testpath / "scan1" / "pair.txt", 3)
    _write_protocol(out_root, "scan1", K, Es, depths)

    args = types.SimpleNamespace(testpath=str(testpath),
                                 filter_method="normal", conf=0.5,
                                 thres_view=2)
    mvs_test._fuse_scan(args, "scan1", out_root)
    n = _ply_vertex_count(out_root / "mvsnet_scan1.ply")
    # only a small consistent sliver (where the corruption ≈ 0) remains of
    # view 0, and views 1/2 lose agreement with view 0
    assert n < 3 * H * W  # strictly fewer than everything
    assert n > 0
