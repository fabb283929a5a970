"""Test-only import shims that make the ACTUAL reference code at
``/root/reference`` importable and runnable on CPU, so parity tests can use
the reference's own forward passes as the golden oracle (instead of
builder-authored re-statements).

The reference modules we target —
``src/models/{nerf_renderer,pixelnerf,resnetfc,positional_encoding,
image_encoder}.py`` and ``src/util/{torch_helpers,depth2normal,
import_helper}.py`` — depend only on torch (installed) plus two absent
packages:

  * ``dotmap``      → a ~15-line attribute-dict stand-in;
  * ``torchvision`` → ``models.resnet18/34`` (standard BasicBlock stack with
    torchvision-compatible state_dict names, randomly initialised —
    parity tests convert weights FROM the instantiated module, so
    pretrained weights are not needed), ``transforms.Normalize`` and
    ``transforms.functional.resize``.

Nothing here is imported by the framework itself; `install()` is idempotent
and only mutates ``sys.modules`` / ``sys.path`` for the test process.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------- dotmap ---
class DotMap(dict):
    """Minimal stand-in for ``dotmap.DotMap`` (attribute-style dict) —
    supports the reference's usage: ``DotMap(fine=...)``, ``out.weights = w``,
    ``render_dict.fine.rgb``."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self.update(dict(*args, **kwargs))

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value


# ----------------------------------------------------------- torchvision ---
class _BasicBlock(nn.Module):
    """torchvision-resnet BasicBlock semantics with matching child names
    (conv1/bn1/conv2/bn2/downsample.{0,1}) so ``state_dict()`` keys line up
    with ``diner_tpu.utils.torch_convert.convert_resnet``."""

    expansion = 1

    def __init__(self, c_in, width, stride=1, norm_layer=nn.BatchNorm2d):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, width, 3, stride, 1, bias=False)
        self.bn1 = norm_layer(width)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = norm_layer(width)
        if stride != 1 or c_in != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, width, 1, stride, bias=False),
                norm_layer(width))
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(identity + y)


class _ResNet(nn.Module):
    """Full 4-stage BasicBlock resnet with torchvision attribute layout
    (conv1, bn1, relu, maxpool, layer1-4, avgpool, fc). The reference's
    SpatialEncoder replaces ``fc``/``avgpool`` with Sequential() and widens
    ``conv1`` for the padded-PE ring (image_encoder.py:50-86)."""

    def __init__(self, blocks, norm_layer=None, num_classes=1000):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        c = 64
        for s in range(4):
            layers = []
            for b in range(blocks[s]):
                stride = 2 if (s > 0 and b == 0) else 1
                layers.append(_BasicBlock(c, widths[s], stride, norm_layer))
                c = widths[s]
            setattr(self, f"layer{s + 1}", nn.Sequential(*layers))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):  # classification path; unused by the encoder
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _resnet18(pretrained=False, norm_layer=None, **kwargs):
    return _ResNet((2, 2, 2, 2), norm_layer)


def _resnet34(pretrained=False, norm_layer=None, **kwargs):
    return _ResNet((3, 4, 6, 3), norm_layer)


class _Normalize(nn.Module):
    """torchvision.transforms.Normalize over (..., C, H, W)."""

    def __init__(self, mean, std, inplace=False):
        super().__init__()
        self.register_buffer("m", torch.tensor(mean).view(-1, 1, 1))
        self.register_buffer("s", torch.tensor(std).view(-1, 1, 1))

    def forward(self, x):
        return (x - self.m) / self.s


def _deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                   padding=(0, 0), dilation=(1, 1), mask=None):
    """CPU re-statement of torchvision.ops.deform_conv2d (DCNv2).

    offset: (B, 2·G·kh·kw, Ho, Wo), (dy, dx) interleaved per tap;
    mask: (B, G·kh·kw, Ho, Wo) or None; groups = Cin // weight.shape[1].
    Bilinear sampling with zero outside. Naive per-tap loops — test-only.
    """
    def _pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)

    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    B, Cin, H, W = input.shape
    O, Cin_g, kh, kw = weight.shape
    groups = Cin // Cin_g
    K = kh * kw
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    n_off_grp = offset.shape[1] // (2 * K)
    assert n_off_grp == 1 and groups == 1, "shim covers the reference usage"

    ys = torch.arange(Ho, dtype=input.dtype) * sh - ph
    xs = torch.arange(Wo, dtype=input.dtype) * sw - pw
    cols = []
    for t in range(K):
        ky, kx = t // kw, t % kw
        oy = offset[:, 2 * t].reshape(B, Ho, Wo)
        ox = offset[:, 2 * t + 1].reshape(B, Ho, Wo)
        sy = ys[None, :, None] + ky * dh + oy
        sx = xs[None, None, :] + kx * dw + ox

        y0 = torch.floor(sy)
        x0 = torch.floor(sx)
        wy1, wx1 = sy - y0, sx - x0
        acc = 0.0
        for iy, wy in ((y0, 1 - wy1), (y0 + 1, wy1)):
            for ix, wx in ((x0, 1 - wx1), (x0 + 1, wx1)):
                valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
                w = torch.where(valid, wy * wx, torch.zeros_like(wy))
                iyc = iy.clamp(0, H - 1).long()
                ixc = ix.clamp(0, W - 1).long()
                idx = (iyc * W + ixc).reshape(B, 1, -1).expand(-1, Cin, -1)
                g = torch.gather(input.reshape(B, Cin, -1), 2, idx)
                acc = acc + g.reshape(B, Cin, Ho, Wo) * w[:, None]
        if mask is not None:
            acc = acc * mask[:, t][:, None]
        cols.append(acc)
    col = torch.stack(cols, dim=2)  # (B, Cin, K, Ho, Wo)
    out = torch.einsum("bckhw,ock->bohw",
                       col, weight.reshape(O, Cin_g, K))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def _resize(img, size, interpolation=None, antialias=None):
    """torchvision.transforms.functional.resize for 3D/4D tensors
    (bilinear). Only referenced from torch_helpers' utility surface."""
    squeeze = img.dim() == 3
    if squeeze:
        img = img.unsqueeze(0)
    if isinstance(size, int):
        h, w = img.shape[-2:]
        if h < w:
            size = (size, int(round(size * w / h)))
        else:
            size = (int(round(size * h / w)), size)
    out = F.interpolate(img, tuple(size), mode="bilinear",
                        align_corners=False,
                        antialias=bool(antialias))
    return out.squeeze(0) if squeeze else out


def install() -> None:
    """Idempotently register the dotmap/torchvision shims and put
    ``/root/reference`` on sys.path so ``import src.models...`` resolves."""
    import matplotlib
    matplotlib.use("Agg", force=True)  # torch_helpers imports pyplot

    if "dotmap" not in sys.modules:
        mod = types.ModuleType("dotmap")
        mod.DotMap = DotMap
        sys.modules["dotmap"] = mod

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        models.resnet18 = _resnet18
        models.resnet34 = _resnet34
        transforms = types.ModuleType("torchvision.transforms")
        transforms.Normalize = _Normalize
        tf = types.ModuleType("torchvision.transforms.functional")
        tf.resize = _resize
        transforms.functional = tf
        ops = types.ModuleType("torchvision.ops")
        ops.deform_conv2d = _deform_conv2d

        class _DeformConv2dModule(nn.Module):
            pass  # referenced but never instantiated by the reference code

        ops.DeformConv2d = _DeformConv2dModule
        tv.models = models
        tv.transforms = transforms
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = tf
        sys.modules["torchvision.ops"] = ops

    if "pytorch3d" not in sys.modules:
        # the NOVEL renderer needs only knn_points(K=1); brute-force torch
        # cdist+topk reproduces pytorch3d's (dists², idx, nn) contract
        p3d = types.ModuleType("pytorch3d")
        ops = types.ModuleType("pytorch3d.ops")
        knn = types.ModuleType("pytorch3d.ops.knn")

        def knn_points(p, v, K=1, **kwargs):
            d = torch.cdist(p, v)  # (SB, P, V)
            dists, idx = torch.topk(d, K, dim=-1, largest=False)
            return dists ** 2, idx, None

        knn.knn_points = knn_points
        ops.knn = knn
        p3d.ops = ops
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.ops"] = ops
        sys.modules["pytorch3d.ops.knn"] = knn

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


class RNGTap:
    """Record-or-replay wrapper around ``torch.rand_like``/``randn_like``.

    The reference draws randomness inline (nerf_renderer.py:57, :188, :390);
    recording the actual draws lets parity tests feed the *same* noise into
    the framework's explicit-RNG entry points, and replaying them lets the
    reference's ``forward()`` be re-run bit-identically.
    """

    def __init__(self):
        self.rand_calls = []
        self.randn_calls = []
        self._orig_rand = torch.rand_like
        self._orig_randn = torch.randn_like
        self._replay_rand = None
        self._replay_randn = None

    # -- record mode -------------------------------------------------------
    def __enter__(self):
        def rand_like(x, **kw):
            v = self._orig_rand(x, **kw)
            if self._replay_rand is not None:
                v = self._replay_rand.pop(0).to(x.dtype).reshape(x.shape)
            self.rand_calls.append(v.detach().clone())
            return v

        def randn_like(x, **kw):
            v = self._orig_randn(x, **kw)
            if self._replay_randn is not None:
                v = self._replay_randn.pop(0).to(x.dtype).reshape(x.shape)
            self.randn_calls.append(v.detach().clone())
            return v

        torch.rand_like = rand_like
        torch.randn_like = randn_like
        return self

    def __exit__(self, *exc):
        torch.rand_like = self._orig_rand
        torch.randn_like = self._orig_randn
        return False

    def replay(self, rand_values, randn_values):
        """Arm replay mode with previously recorded draw lists."""
        self._replay_rand = [v.clone() for v in rand_values]
        self._replay_randn = [v.clone() for v in randn_values]
        return self
