"""Convert torch/torchvision-style state dicts into flax variable trees.

Used to (a) load released DINER / torchvision pretrained weights into the
TPU framework, and (b) drive parity tests against torch re-statements of the
reference networks. Input is a flat mapping ``name -> np.ndarray`` (call
``{k: v.detach().numpy() for k, v in module.state_dict().items()}`` on the
torch side; no torch dependency here).

Layout conventions:
  torch Conv2d weight  (O, I, kH, kW) → flax kernel (kH, kW, I, O)
  torch Linear weight  (O, I)         → flax kernel (I, O)
  torch BatchNorm weight/bias         → flax scale/bias (params)
  torch running_mean/var              → flax batch_stats mean/var
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def convert_resnet(sd: Mapping[str, np.ndarray], num_layers: int = 4,
                   backbone_blocks=(3, 4, 6, 3)):
    """torchvision resnet{18,34} state_dict → ResNetEncoder variables.

    Only the stages the truncated encoder uses (``num_layers`` pyramid
    levels) are converted.
    """
    params: Dict = {}
    stats: Dict = {}

    def bn(src_prefix, dst_name):
        _set(params, dst_name + ("scale",), sd[src_prefix + ".weight"])
        _set(params, dst_name + ("bias",), sd[src_prefix + ".bias"])
        _set(stats, dst_name + ("mean",), sd[src_prefix + ".running_mean"])
        _set(stats, dst_name + ("var",), sd[src_prefix + ".running_var"])

    _set(params, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", ("bn1",))

    for stage in range(4):
        if num_layers <= stage + 1:
            break
        for blk in range(backbone_blocks[stage]):
            src = f"layer{stage + 1}.{blk}"
            dst = f"layer{stage + 1}_{blk}"
            _set(params, (dst, "conv1", "kernel"), _conv(sd[src + ".conv1.weight"]))
            _set(params, (dst, "conv2", "kernel"), _conv(sd[src + ".conv2.weight"]))
            bn(src + ".bn1", (dst, "bn1"))
            bn(src + ".bn2", (dst, "bn2"))
            if src + ".downsample.0.weight" in sd:
                _set(params, (dst, "downsample_conv", "kernel"),
                     _conv(sd[src + ".downsample.0.weight"]))
                bn(src + ".downsample.1", (dst, "downsample_bn"))
    return {"params": params, "batch_stats": stats}


def convert_resnetfc(sd: Mapping[str, np.ndarray], n_blocks: int = 5,
                     combine_layer: int = 3):
    """Reference ResnetFC state_dict → our ResnetFC params."""
    params: Dict = {}

    def lin(src, dst):
        _set(params, dst + ("kernel",), _linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), sd[src + ".bias"])

    lin("lin_in", ("lin_in",))
    lin("lin_out", ("lin_out",))
    for i in range(min(combine_layer, n_blocks)):
        lin(f"lin_z.{i}", (f"lin_z_{i}",))
    for i in range(n_blocks):
        lin(f"blocks.{i}.fc_0", (f"block_{i}", "fc_0"))
        lin(f"blocks.{i}.fc_1", (f"block_{i}", "fc_1"))
        if f"blocks.{i}.shortcut.weight" in sd:
            lin(f"blocks.{i}.shortcut", (f"block_{i}", "shortcut"))
    return {"params": params}


def convert_spatial_encoder(sd: Mapping[str, np.ndarray], num_layers: int = 4,
                            backbone_blocks=(3, 4, 6, 3)):
    """Reference SpatialEncoder (``model.*`` = torchvision resnet) →
    our SpatialEncoder variables (resnet nested under scope 'resnet')."""
    inner = {k[len("model."):]: v for k, v in sd.items()
             if k.startswith("model.")}
    conv = convert_resnet(inner, num_layers, backbone_blocks)
    return {
        "params": {"resnet": conv["params"]},
        "batch_stats": {"resnet": conv["batch_stats"]},
    }


def convert_pixelnerf(sd: Mapping[str, np.ndarray], n_blocks: int = 5,
                      combine_layer: int = 3, num_layers: int = 4,
                      backbone_blocks=(3, 4, 6, 3)):
    """Reference PixelNeRF state_dict (``encoder.*`` + ``mlp_fine.*``) →
    our PixelNeRF variables."""
    enc = convert_spatial_encoder(
        {k[len("encoder."):]: v for k, v in sd.items()
         if k.startswith("encoder.")}, num_layers, backbone_blocks)
    mlp = convert_resnetfc(
        {k[len("mlp_fine."):]: v for k, v in sd.items()
         if k.startswith("mlp_fine.")}, n_blocks, combine_layer)
    return {
        "params": {"encoder": enc["params"], "mlp": mlp["params"]},
        "batch_stats": {"encoder": enc["batch_stats"]},
    }


def convert_vgg19_features(sd: Mapping[str, np.ndarray]):
    """torchvision vgg19 ``features.*`` conv weights → our VGG19 params.

    Returns params keyed ``conv_{torch_index}`` so the slice structure of
    the reference VGG loss maps 1:1.
    """
    params: Dict = {}
    for k, v in sd.items():
        k = k.removeprefix("features.")
        idx, kind = k.split(".")
        if kind == "weight":
            _set(params, (f"conv_{idx}", "kernel"), _conv(v))
        elif kind == "bias":
            _set(params, (f"conv_{idx}", "bias"), v)
    return {"params": params}
