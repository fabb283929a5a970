#!/usr/bin/env python
"""Multiface preprocessing: render GT depth + masks from tracked meshes.

Parity target: ``deps/multiface/process_dataset.py`` — for every
subject/sequence/frame/camera, rasterize the tracked mesh into a z-buffer
depth map and a validity mask, writing
``<subj>/depths/<seq>/<cam>/<frame>.png`` (uint16, 0.1 mm resolution —
SCALE_FACTOR 1e-1 on mm depths, process_dataset.py:37-47) and
``<subj>/masks/<seq>/<cam>/<frame>.png``. The reference uses pyrender/EGL;
here the z-buffer is the framework's TPU rasterizer
(``diner_tpu.preprocessing.rasterize``) — no GL required.

    python scripts/preprocess_multiface.py --root data/MULTIFACE -H 2048 -W 1334
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

UINT16_MAX = 65535
SCALE_FACTOR = 1e-1  # 6.5535 m range at 0.1 mm resolution (mm inputs)


def float32_2_uint16(x: np.ndarray) -> np.ndarray:
    float_max = UINT16_MAX * SCALE_FACTOR
    return (x.clip(max=float_max) / SCALE_FACTOR).round().astype(np.uint16)


def uint16_2_float32(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32) * SCALE_FACTOR


def process_frame(mesh_path, krt, out_subj, seq_name, H, W):
    from PIL import Image
    from diner_tpu.preprocessing.rasterize import (
        load_obj_vertices_faces, rasterize_depth)

    verts, faces = load_obj_vertices_faces(mesh_path)
    for cam_name in sorted(krt.keys()):
        K = krt[cam_name]["intrin"].astype(np.float32)
        E34 = krt[cam_name]["extrin"].astype(np.float32)
        depth = np.asarray(rasterize_depth(verts, faces, K, E34, H, W))
        alpha = (depth != 0).astype(np.float32)

        out_d = out_subj / "depths" / seq_name / cam_name / \
            f"{mesh_path.stem}.png"
        out_a = out_subj / "masks" / seq_name / cam_name / \
            f"{mesh_path.stem}.png"
        out_d.parent.mkdir(parents=True, exist_ok=True)
        out_a.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(float32_2_uint16(depth)).save(out_d)
        Image.fromarray((alpha * 255).astype(np.uint8)).save(out_a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("data/MULTIFACE"))
    ap.add_argument("--subjects", "-s", nargs="*", default=[])
    ap.add_argument("-H", type=int, default=2048)
    ap.add_argument("-W", type=int, default=1334)
    args = ap.parse_args()

    from diner_tpu.data.multiface import load_krt

    subjects = args.subjects or sorted(
        p.name for p in args.root.iterdir() if p.is_dir())
    for subj in subjects:
        subj_path = args.root / subj
        krt = load_krt(subj_path / "KRT")
        mesh_root = subj_path / "tracked_mesh"
        if not mesh_root.exists():
            print(f"skipping {subj}: no tracked_mesh/")
            continue
        for seq_path in sorted(mesh_root.iterdir()):
            meshes = [p for p in sorted(seq_path.iterdir())
                      if p.suffix == ".obj"]
            for i, mesh_path in enumerate(meshes):
                process_frame(mesh_path, krt, subj_path, seq_path.name,
                              args.H, args.W)
                print(f"{subj}/{seq_path.name}: {i + 1}/{len(meshes)}",
                      flush=True)


if __name__ == "__main__":
    main()
