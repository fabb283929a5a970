"""Drop-in discovery of converted pretrained weights.

The reference depends on three sets of downloaded weights this zero-egress
environment cannot fetch:

  - torchvision ResNet34 (ImageNet) for the spatial encoder
    (``/root/reference/src/models/image_encoder.py:50-56``)
  - torchvision VGG19 (ImageNet) for the perceptual loss
    (``/root/reference/src/losses/vggloss.py:48``)
  - LPIPS VGG16 + linear calibration heads for the eval suite
    (``/root/reference/src/evaluation/eval_suite.py:52-77``)

``scripts/import_pretrained.py`` converts the original ``.pth`` files
(see docs/PRETRAINED.md for the exact expected filenames) into ``.npz``
trees under the directory returned by :func:`pretrained_dir`. Everything
here degrades gracefully: when a converted file is absent the framework
falls back to its documented substitutes (fresh-init encoder, fixed-seed
VGG19 loss net, ``lpips_proxy``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# converted artifact filenames (written by scripts/import_pretrained.py)
RESNET34_NPZ = "resnet34_imagenet.npz"
VGG19_NPZ = "vgg19_imagenet.npz"
LPIPS_NPZ = "lpips_vgg.npz"

LPIPS_PROXY_NOTE = (
    "uniform-calibration proxy (official LPIPS VGG16+lin weights not "
    "present); values are NOT comparable to reference LPIPS ranges "
    "[0, 0.5] — see docs/PRETRAINED.md for the drop-in runbook"
)


def pretrained_dir() -> Path:
    """Weights directory: $DINER_TPU_PRETRAINED or <repo>/assets/pretrained."""
    env = os.environ.get("DINER_TPU_PRETRAINED")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "assets" / "pretrained"


def save_tree_npz(path, tree) -> None:
    """Save a nested dict-of-arrays as an npz with '/'-joined keys."""
    flat: Dict[str, np.ndarray] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                walk(f"{prefix}/#{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **flat)


def load_tree_npz(path):
    """Inverse of :func:`save_tree_npz` ('#N' segments become tuples)."""
    data = np.load(path)
    tree: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]

    def fix(node):
        if isinstance(node, dict):
            if node and all(k.startswith("#") for k in node):
                return tuple(fix(node[f"#{i}"]) for i in range(len(node)))
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(tree)


def _maybe(name: str):
    p = pretrained_dir() / name
    return load_tree_npz(p) if p.exists() else None


def load_resnet34_variables() -> Optional[dict]:
    """Converted torchvision resnet34 {'params':…, 'batch_stats':…} or None."""
    return _maybe(RESNET34_NPZ)


def load_vgg19_loss_params() -> Optional[dict]:
    """Converted VGG19 'params' tree for the perceptual loss, or None."""
    t = _maybe(VGG19_NPZ)
    return t["params"] if t else None


def load_lpips_params() -> Optional[dict]:
    """{'vgg': params, 'lins': tuple} for real LPIPS, or None."""
    return _maybe(LPIPS_NPZ)


def lpips_params_or_proxy():
    """Resolve the eval suite's default: real params if present else proxy."""
    params = load_lpips_params()
    return params if params is not None else "proxy"


def graft_resnet34(variables: dict, pretrained: dict) -> dict:
    """Replace the encoder's resnet subtree with pretrained ImageNet weights.

    The encoder widens conv1's input from 3 to 3+d_pe channels for the
    padded-ring positional stamp; like the reference
    (``image_encoder.py:60-86``) the pretrained RGB slice is copied into
    the first 3 input channels and the stamp channels keep their fresh
    initialization. All other resnet params and BN running stats are
    replaced wholesale.

    Args:
      variables: full model variables with params/encoder/resnet (+
        batch_stats/encoder/resnet) subtrees.
      pretrained: {'params':…, 'batch_stats':…} from convert_resnet.

    Returns:
      new variables dict (inputs unmodified).
    """
    import jax
    import jax.numpy as jnp

    def merge(dst, src, path=()):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, path + (k,))
            else:
                cur = dst[k]
                v = jnp.asarray(v, jnp.asarray(cur).dtype)
                if path + (k,) == ("conv1", "kernel") and \
                        cur.shape[2] != v.shape[2]:
                    out[k] = jnp.asarray(cur).at[:, :, :v.shape[2], :].set(v)
                else:
                    if cur.shape != v.shape:
                        raise ValueError(
                            f"shape mismatch at {'/'.join(path + (k,))}: "
                            f"{cur.shape} vs {v.shape}")
                    out[k] = v
        return out

    new = dict(variables)
    new["params"] = dict(variables["params"])
    enc = dict(new["params"]["encoder"])
    enc["resnet"] = merge(enc["resnet"], pretrained["params"])
    new["params"]["encoder"] = enc
    if "batch_stats" in variables and pretrained.get("batch_stats"):
        new["batch_stats"] = dict(variables["batch_stats"])
        benc = dict(new["batch_stats"]["encoder"])
        benc["resnet"] = merge(benc["resnet"], pretrained["batch_stats"])
        new["batch_stats"]["encoder"] = benc
    del jax
    return new
