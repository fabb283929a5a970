#!/usr/bin/env python
"""Fabricate a geometrically consistent DTU-protocol scan for hardware runs.

Renders a procedurally textured, gently curved surface from the quad-grid
view ids that ``MVSDTUDataset`` consumes (reference
``deps/TransMVSNet/datasets/dtu_yao.py``): 1200x1600 ``Rectified`` images,
1200x1600 pfm GT depths + ``depth_visual`` masks, and ``Cameras/train``
cam.txt files whose intrinsics are stage1-scale (128x160), exactly matching
the upstream ``prepare_img`` crop chain (x1/2 nearest, center-crop 512x640).

This exists so the full-resolution TransMVSNet graph can be trained /
write_prediction'd on real TPU hardware without the (licensed) DTU data.
Depths are metric-plausible (surface around z=600mm, DTU's 425..~900 sweep).

Usage:
    python scripts/make_dtu_fixture.py <outdir> [--lights 1] [--hw 1200,1600]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.data.io import write_pfm  # noqa: E402


def _texture(x, y):
    """Procedural RGB texture over world (x, y) mm — high-frequency enough
    for photometric matching to be meaningful."""
    r = 0.5 + 0.25 * np.sin(x * 0.11) * np.cos(y * 0.13) \
        + 0.25 * np.sin(0.031 * (x + 2 * y))
    g = 0.5 + 0.25 * np.cos(x * 0.07 + 1.0) * np.sin(y * 0.17) \
        + 0.25 * np.cos(0.023 * (2 * x - y))
    b = 0.5 + 0.5 * np.sin(0.05 * x + 0.09 * y + 2.0)
    return np.clip(np.stack([r, g, b], -1), 0.0, 1.0)


def _surface_z(x, y):
    """Curved surface z(x, y) in mm."""
    return 600.0 + 60.0 * np.sin(x * 0.012) * np.cos(y * 0.015) \
        + 25.0 * np.sin(0.03 * (x - y))


def render_view(K_hr, E, H, W):
    """Ray-march (4 fixed-point iters; gentle slopes) the surface from a
    camera with world-to-cam extrinsic E; returns (rgb u8, depth f32).

    The iteration converges to *cam-space* depth only because every
    generated extrinsic is a pure translation (R = I, see main()): then
    world z == cam z and ``z`` below is the returned depth directly. If the
    camera grid ever gains rotations, compute cam-space z explicitly as
    ``(R @ p + t)[2]``."""
    R, t = E[:3, :3], E[:3, 3]
    cam_origin = -R.T @ t  # camera center in world
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    d_cam = np.stack([(u - K_hr[0, 2]) / K_hr[0, 0],
                      (v - K_hr[1, 2]) / K_hr[1, 1],
                      np.ones_like(u)], -1)
    d_world = d_cam @ R  # == R.T @ d_cam per-pixel
    z = np.full((H, W), 600.0)
    for _ in range(4):
        # cam-space depth z == t_ray * d_cam_z (d_cam_z = 1 by construction)
        p = cam_origin + d_world * z[..., None]
        z = z + 0.8 * (_surface_z(p[..., 0], p[..., 1])
                       - p[..., 2])  # move along ray toward the surface
    p = cam_origin + d_world * z[..., None]
    rgb = (_texture(p[..., 0], p[..., 1]) * 255).astype(np.uint8)
    return rgb, z.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--lights", type=int, default=7,
                    help="how many of the 7 light conditions to materialize "
                         "(same image content; symlinked)")
    ap.add_argument("--scan", default="scan1")
    args = ap.parse_args()
    from PIL import Image

    root = Path(args.outdir)
    (root / "Cameras/train").mkdir(parents=True, exist_ok=True)
    (root / "Rectified" / f"{args.scan}_train").mkdir(parents=True,
                                                      exist_ok=True)
    (root / "Depths" / args.scan).mkdir(parents=True, exist_ok=True)

    H, W = 1200, 1600
    # stage1-scale intrinsics (128x160) as stored in DTU cam files
    K_s1 = np.array([[180.0, 0, 80.0], [0, 180.0, 64.0], [0, 0, 1]])
    K_s3 = K_s1.copy()
    K_s3[:2] *= 4.0
    K_hr = K_s3.copy()
    K_hr[:2] *= 2.0
    K_hr[0, 2] += 160.0  # undo prepare_img crop (cols 80 @ half-res)
    K_hr[1, 2] += 88.0   # rows 44 @ half-res

    # render ALL 49 views (train mode's quad grid touches most ids);
    # cameras on a 7x7 baseline grid looking +z
    for i in range(49):
        E = np.eye(4)
        E[0, 3] = 12.0 * (i % 7 - 3)
        E[1, 3] = 9.0 * (i // 7 - 3)
        lines = ["extrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in K_s1]
        lines += ["", "425.0 2.5"]
        (root / "Cameras/train" / f"{i:08d}_cam.txt").write_text(
            "\n".join(lines) + "\n")
        rgb, depth = render_view(K_hr, E, H, W)
        img0 = root / "Rectified" / f"{args.scan}_train" / \
            f"rect_{i + 1:03d}_0_r5000.png"
        Image.fromarray(rgb).save(img0)
        for light in range(1, args.lights):
            dst = img0.with_name(f"rect_{i + 1:03d}_{light}_r5000.png")
            if not dst.exists():
                dst.symlink_to(img0.name)
        write_pfm(root / "Depths" / args.scan / f"depth_map_{i:04d}.pfm",
                  depth)
        Image.fromarray(np.full((H, W), 255, np.uint8)).save(
            root / "Depths" / args.scan / f"depth_visual_{i:04d}.png")
    listfile = root / "list.txt"
    listfile.write_text(f"{args.scan}\n")
    print(f"fixture at {root} (list: {listfile})")


if __name__ == "__main__":
    main()
