#!/usr/bin/env python
"""Convert the reference's pretrained .pth weights into drop-in .npz trees.

The reference downloads three weight sets this environment cannot
(zero egress); when they CAN enter, drop the original files into
``assets/pretrained/`` (or $DINER_TPU_PRETRAINED) and run this script —
every consumer picks the converted trees up automatically on the next
run. Expected input files (exact torchvision / lpips release names):

  resnet34-b627a593.pth   torchvision ImageNet ResNet34
                          (reference src/models/image_encoder.py:50-56)
  vgg19-dcbb9e9d.pth      torchvision ImageNet VGG19
                          (reference src/losses/vggloss.py:48)
  vgg16-397923af.pth      torchvision ImageNet VGG16 (LPIPS backbone)
  lpips_vgg_v0.1.pth      lpips package lpips/weights/v0.1/vgg.pth
                          (reference src/evaluation/eval_suite.py:52-77)

Usage:  python scripts/import_pretrained.py [--weights-dir DIR]
See docs/PRETRAINED.md for the full runbook.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from diner_tpu.utils import pretrained as P


def _load_sd(path: Path):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v) for k, v in sd.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", type=Path, default=None,
                    help="directory holding the original .pth files and "
                         "receiving the converted .npz trees "
                         "(default: assets/pretrained)")
    args = ap.parse_args(argv)
    wdir = args.weights_dir or P.pretrained_dir()
    wdir.mkdir(parents=True, exist_ok=True)
    converted = []

    src = wdir / "resnet34-b627a593.pth"
    if src.exists():
        from diner_tpu.utils.torch_convert import convert_resnet
        tree = convert_resnet(_load_sd(src), num_layers=4,
                              backbone_blocks=(3, 4, 6, 3))
        P.save_tree_npz(wdir / P.RESNET34_NPZ, tree)
        converted.append(P.RESNET34_NPZ)

    src = wdir / "vgg19-dcbb9e9d.pth"
    if src.exists():
        from diner_tpu.utils.torch_convert import convert_vgg19_features
        tree = convert_vgg19_features(_load_sd(src))
        P.save_tree_npz(wdir / P.VGG19_NPZ, tree)
        converted.append(P.VGG19_NPZ)

    vgg16 = wdir / "vgg16-397923af.pth"
    lins = wdir / "lpips_vgg_v0.1.pth"
    if vgg16.exists() and lins.exists():
        from diner_tpu.evaluation.metrics import load_lpips_weights
        params = load_lpips_weights(_load_sd(vgg16), _load_sd(lins))
        P.save_tree_npz(wdir / P.LPIPS_NPZ, params)
        converted.append(P.LPIPS_NPZ)

    if converted:
        print(f"converted into {wdir}: {', '.join(converted)}")
    else:
        print(f"no recognized .pth files in {wdir} — expected any of: "
              "resnet34-b627a593.pth, vgg19-dcbb9e9d.pth, "
              "vgg16-397923af.pth + lpips_vgg_v0.1.pth")
    return converted


if __name__ == "__main__":
    main()
