#!/usr/bin/env python
"""Depth-map fusion driver (gipuma protocol).

Mirrors the reference flow (``deps/TransMVSNet/gipuma.py:192-213``):
probability-filter per-view depth maps, then run the consistency fusion and
write a fused PLY per scan.

Expected layout per scan directory (the reference's "dense folder"):
    cams/<stem>_cam.txt        MVSNet camera files
    depth_est/<stem>.pfm       estimated depth
    confidence/<stem>.pfm      photometric confidence
    images/<stem>.jpg|png      (optional, for point colors)

    python scripts/fuse.py --scan_dir <dense_folder> --out fused.ply \
        [--prob_threshold 0.9] [--disp_threshold 0.25] [--num_consistent 3]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--prob_threshold", type=float, default=0.9)
    ap.add_argument("--disp_threshold", type=float, default=0.25)
    ap.add_argument("--normal_threshold", type=float, default=0.52)
    ap.add_argument("--num_consistent", type=int, default=3)
    args = ap.parse_args()

    from diner_tpu.data.io import read_pfm, read_rgb
    from diner_tpu.data.dtu import read_cam_file
    from diner_tpu.fusion import fuse_depth_maps, write_ply
    from diner_tpu.fusion.fusion import fake_normals, probability_filter

    scan = Path(args.scan_dir)
    stems = sorted(p.stem for p in (scan / "depth_est").glob("*.pfm"))
    depths, normals, Ps, focals, colors = [], [], [], [], []
    for stem in stems:
        depth = np.asarray(read_pfm(scan / "depth_est" / f"{stem}.pfm")[0],
                           np.float32)
        conf = np.asarray(read_pfm(scan / "confidence" / f"{stem}.pfm")[0],
                          np.float32)
        depth = probability_filter(depth, conf, args.prob_threshold)
        K, E, _ = read_cam_file(scan / "cams" / f"{stem}_cam.txt")
        Ps.append((K @ E[:3]).astype(np.float32))
        focals.append(K[0, 0])
        depths.append(depth)
        normals.append(fake_normals(depth))
        img = None
        for ext in (".jpg", ".png"):
            p = scan / "images" / f"{stem}{ext}"
            if p.exists():
                img = read_rgb(p)[..., :3]
                break
        colors.append(img)

    depths = np.stack(depths)
    normals = np.stack(normals)
    colors = (np.stack(colors) if all(c is not None for c in colors)
              else None)
    pts = fuse_depth_maps(depths, normals, np.stack(Ps),
                          np.asarray(focals, np.float32), colors,
                          disp_thresh=args.disp_threshold,
                          normal_thresh=args.normal_threshold,
                          num_consistent=args.num_consistent)
    write_ply(args.out, pts, with_colors=colors is not None)
    print(f"fused {len(pts)} points -> {args.out}")


if __name__ == "__main__":
    main()
