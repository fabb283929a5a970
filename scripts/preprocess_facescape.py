#!/usr/bin/env python
"""Facescape preprocessing CLI: square-crop, resize, undistort, GT depth,
color calibration.

Parity target: ``deps/facescape_preprocessing/process_dataset.py`` (the
reference's --tmp_dir copy dance and trailing ``rm -r <dir_out>`` bug at
process_dataset.py:287 are not replicated).

    python scripts/preprocess_facescape.py --dir_in RAW/1 --dir_out OUT/001 \
        --rt_scale assets/facescape/Rt_scale_dict.json \
        [--landmarks assets/facescape/landmark_indices.npz]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir_in", type=Path, required=True,
                    help="input subject directory, e.g. FACESCAPE_RAW/1")
    ap.add_argument("--dir_out", type=Path, required=True,
                    help="output subject directory, e.g. PROCESSED/001")
    ap.add_argument("--rt_scale", type=Path, required=True,
                    help="Rt_scale_dict.json (facescape alignment asset)")
    ap.add_argument("--landmarks", type=Path, default=None,
                    help="landmark_indices.npz (optional; skips 3dlmks "
                         "export when absent)")
    ap.add_argument("--crop_out", type=int, default=256)
    ap.add_argument("--padding_v", type=float, default=0.01)
    ap.add_argument("--padding_h", type=float, default=0.05)
    ap.add_argument("--no-calibrate", action="store_true")
    args = ap.parse_args()

    import numpy as np
    from diner_tpu.preprocessing.facescape_pipeline import process_pose

    with open(args.rt_scale) as f:
        align_Rts = json.load(f)
    lm_indices = None
    if args.landmarks and args.landmarks.exists():
        lm_indices = np.load(args.landmarks)["v10"]

    pose_dirs = sorted(d for d in args.dir_in.iterdir()
                       if d.is_dir() and d.name[0].isdigit())
    args.dir_out.mkdir(parents=True, exist_ok=True)
    for pose_dir in pose_dirs:
        try:
            ok = process_pose(pose_dir, args.dir_out, align_Rts, lm_indices,
                              crop_out=args.crop_out,
                              padding_v=args.padding_v,
                              padding_h=args.padding_h,
                              calibrate=not args.no_calibrate)
            print(f"{pose_dir.name}: {'ok' if ok else 'skipped'}",
                  flush=True)
        except Exception as e:  # per-pose robustness (reference: print+skip)
            print(f"ERROR {pose_dir.name}: {e}", flush=True)


if __name__ == "__main__":
    main()
