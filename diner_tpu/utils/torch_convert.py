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


def _conv3d(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, kD, kH, kW) → flax (kD, kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d (I, O, kD, kH, kW) → our interior-pad VALID
    conv layout (kD, kH, kW, I, O) with spatial flip (DeconvBnReLU3D)."""
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def _dcn_kernel(w: np.ndarray) -> np.ndarray:
    """torch DCN main weight (O, C, kh, kw) → our (kh·kw·C, O) matmul kernel
    (tap-major, channel-minor — matches mvs/dcn.py's gather concat)."""
    O, C, kh, kw = w.shape
    return np.transpose(w, (2, 3, 1, 0)).reshape(kh * kw * C, O)


def convert_transmvsnet(sd: Mapping[str, np.ndarray], num_stage: int = 3,
                        n_fmt_layers: int = 8):
    """Reference TransMVSNet state_dict (deps/TransMVSNet/models/) → our
    flax variables. Covers FeatureNet (+DCN heads), FMT + pathway,
    CostRegNet ×num_stage, PixelwiseNet. Enables loading released
    TransMVSNet checkpoints and true-reference parity testing."""
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst):
        _set(params, dst + ("scale",), sd[src + ".weight"])
        _set(params, dst + ("bias",), sd[src + ".bias"])
        _set(stats, dst + ("mean",), sd[src + ".running_mean"])
        _set(stats, dst + ("var",), sd[src + ".running_var"])

    def conv_bn(src, dst, conv=_conv):
        _set(params, dst + ("conv", "kernel"), conv(sd[src + ".conv.weight"]))
        bn(src + ".bn", dst + ("bn",))

    # ---------------- FeatureNet -----------------------------------------
    F = ("feature",)
    for i, n in ((0, 2), (1, 3), (2, 3)):
        for j in range(n):
            conv_bn(f"feature.conv{i}.{j}", F + (f"conv{i}_{j}",))
    for n in (1, 2, 3):
        conv_bn(f"feature.out{n}.0", F + (f"out{n}_conv",))
        for slot, idx in ((0, 1), (1, 4), (2, 7)):
            src = f"feature.out{n}.{idx}"
            dst = F + (f"out{n}_dcn{slot}",)
            _set(params, dst + ("kernel",), _dcn_kernel(sd[src + ".weight"]))
            _set(params, dst + ("bias",), sd[src + ".bias"])
            _set(params, dst + ("conv_offset_mask", "kernel"),
                 _conv(sd[src + ".conv_offset_mask.weight"]))
            _set(params, dst + ("conv_offset_mask", "bias"),
                 sd[src + ".conv_offset_mask.bias"])
        for slot, idx in ((0, 2), (1, 5)):
            bn(f"feature.out{n}.{idx}", F + (f"out{n}_bn{slot}",))
    for n in (1, 2):
        _set(params, F + (f"inner{n}", "kernel"),
             _conv(sd[f"feature.inner{n}.weight"]))
        _set(params, F + (f"inner{n}", "bias"), sd[f"feature.inner{n}.bias"])

    # ---------------- FMT + pathway --------------------------------------
    P = ("FMT_with_pathway",)
    for i in range(n_fmt_layers):
        src = f"FMT_with_pathway.FMT.layers.{i}"
        dst = P + ("FMT", f"layer_{i}")
        for proj in ("query", "key", "value", "out"):
            _set(params, dst + ("attention", f"{proj}_projection", "kernel"),
                 _linear(sd[f"{src}.attention.{proj}_projection.weight"]))
            _set(params, dst + ("attention", f"{proj}_projection", "bias"),
                 sd[f"{src}.attention.{proj}_projection.bias"])
        for lin in ("linear1", "linear2"):
            _set(params, dst + (lin, "kernel"),
                 _linear(sd[f"{src}.{lin}.weight"]))
            _set(params, dst + (lin, "bias"), sd[f"{src}.{lin}.bias"])
        for nrm in ("norm1", "norm2"):
            _set(params, dst + (nrm, "scale"), sd[f"{src}.{nrm}.weight"])
            _set(params, dst + (nrm, "bias"), sd[f"{src}.{nrm}.bias"])
    for n in (1, 2):
        _set(params, P + (f"dim_reduction_{n}", "kernel"),
             _conv(sd[f"FMT_with_pathway.dim_reduction_{n}.weight"]))
        _set(params, P + (f"smooth_{n}", "kernel"),
             _conv(sd[f"FMT_with_pathway.smooth_{n}.weight"]))

    # ---------------- CostRegNets ----------------------------------------
    for s in range(num_stage):
        src0 = f"cost_regularization.{s}"
        dst0 = (f"cost_reg_{s}",)
        for c in range(7):
            conv_bn(f"{src0}.conv{c}", dst0 + (f"conv{c}",), _conv3d)
        for c in (7, 9, 11):
            _set(params, dst0 + (f"conv{c}", "conv", "kernel"),
                 _deconv3d(sd[f"{src0}.conv{c}.conv.weight"]))
            bn(f"{src0}.conv{c}.bn", dst0 + (f"conv{c}", "bn"))
        _set(params, dst0 + ("prob", "kernel"),
             _conv3d(sd[f"{src0}.prob.weight"]))

    # ---------------- PixelwiseNet ---------------------------------------
    D = ("depth_net", "pixel_wise_net")
    conv_bn("DepthNet.pixel_wise_net.conv0", D + ("conv0",), _conv3d)
    conv_bn("DepthNet.pixel_wise_net.conv1", D + ("conv1",), _conv3d)
    _set(params, D + ("conv2", "kernel"),
         _conv3d(sd["DepthNet.pixel_wise_net.conv2.weight"]))
    _set(params, D + ("conv2", "bias"),
         sd["DepthNet.pixel_wise_net.conv2.bias"])

    return {"params": params, "batch_stats": stats}
