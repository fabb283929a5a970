"""KeypointNeRF building blocks (flax, channels-last).

Parity targets: reference ``src/util/keypointnerf_util.py`` — weight-normed
MLP / MLPUNet / PoolModule / MLPUNetFusion (:511-783), stacked-hourglass
geometry encoder HGFilterV2 (:296-450 — group norm, bicubic skip upsample),
ResBlkEncoder texture encoder (:234-294 — instance norm, replication pads) —
and ``src/models/keypointnerf.py:1292-1355`` (IBRRenderingHead: IBRNet-style
learned view-softmax color blending).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from diner_tpu.utils.resize import resize_bicubic_align_corners


def get_nl(name: Optional[str]):
    if name in (None, "none", "None", ""):
        return None
    return {
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
        "softplus": lambda x: nn.softplus(100.0 * x) / 100.0,
        "elu": nn.elu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        "relu": nn.relu,
    }[name]


class WNLinear(nn.Module):
    """Linear with optional weight normalization (torch weight_norm dim=0:
    per-output-row direction v and magnitude g)."""

    features: int
    weight_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        if not self.weight_norm:
            return nn.Dense(self.features, dtype=self.dtype, name="linear")(x)
        v = self.param("v", nn.initializers.lecun_normal(),
                       (in_f, self.features))
        g = self.param("g", lambda key, shape: jnp.linalg.norm(
            v, axis=0), (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        w = v / jnp.linalg.norm(v, axis=0, keepdims=True) * g
        return x.astype(self.dtype) @ w.astype(self.dtype) + b


class MLP(nn.Module):
    """Skip-connected MLP (keypointnerf_util.py:590-622)."""

    n_dims: Sequence[int]
    skip_layers: Sequence[int] = ()
    nl_layer: str = "softplus"
    weight_norm: bool = True
    last_op: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nl = get_nl(self.nl_layer)
        x0 = x
        n = len(self.n_dims) - 1
        for i in range(n):
            if i in self.skip_layers:
                x = jnp.concatenate([x, x0], axis=-1)
            wn = self.weight_norm and i != n - 1
            x = WNLinear(self.n_dims[i + 1], wn, self.dtype,
                         name=f"layer_{i}")(x)
            if i != n - 1 and nl is not None:
                x = nl(x)
        last = get_nl(self.last_op)
        return last(x) if last is not None else x


class MLPUNet(nn.Module):
    """MLP with image-feature skip injections (keypointnerf_util.py:684-755)."""

    n_dims: Sequence[int]
    skip_dims: Sequence[int]
    skip_layers: Sequence[int]
    nl_layer: str = "softplus"
    weight_norm: bool = True
    addition: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feats: List[jnp.ndarray]):
        nl = get_nl(self.nl_layer)
        skip_dict = {j: i for i, j in enumerate(self.skip_layers)}
        n = len(self.n_dims) - 1
        for i in range(n):
            if i in self.skip_layers:
                f = feats[skip_dict[i]]
                if x is not None:
                    x = x + f if self.addition else jnp.concatenate(
                        [x, f], axis=-1)
                else:
                    x = f
            wn = self.weight_norm and i != n - 1
            x = WNLinear(self.n_dims[i + 1], wn, self.dtype,
                         name=f"layer_{i}")(x)
            if i != n - 1 and nl is not None:
                x = nl(x)
        return x


def pool_ops(x, pool_types: Sequence[str], w=None):
    """View pooling (keypointnerf_util.py:757-783). x: (B, V, N, C)."""
    ret = []
    if "max" in pool_types:
        ret.append(jnp.max(x, axis=1))
    if any(p in pool_types for p in ("mean", "var")):
        mean = jnp.sum(w * x, axis=1) if w is not None else jnp.mean(x, axis=1)
        if "mean" in pool_types:
            ret.append(mean)
        if "var" in pool_types:
            if w is not None:
                var = jnp.sum(w * (x - mean[:, None]) ** 2, axis=1)
            else:
                var = jnp.mean((x - mean[:, None]) ** 2, axis=1)
            ret.append(var)
    return jnp.concatenate(ret, axis=-1)


class MLPUNetFusion(nn.Module):
    """Per-view MLPUNet → masked view pooling → fusion MLP
    (keypointnerf_util.py:511-552)."""

    n_dims1: Sequence[int]
    n_dims2: Sequence[int]
    skip_dims: Sequence[int]
    skip_layers: Sequence[int]
    nl_layer: str = "softplus"
    weight_norm: bool = True
    pool_types: Sequence[str] = ("mean",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feats: List[jnp.ndarray], a, w=None):
        """x: (B, V, N, C) spatial encoding; feats: list of (B, V, N, Fi);
        a: (B, V, N, 1) mask; w: (B, V, N, 1) weights.
        Returns (out, valid, x_view, x_pool)."""
        x_view = MLPUNet(self.n_dims1, self.skip_dims, self.skip_layers,
                         self.nl_layer, self.weight_norm, dtype=self.dtype,
                         name="layers1")(x, feats)
        a_sum = jnp.sum(a, axis=1)
        if w is None:
            w = a / (a_sum[:, None] + 1e-6)
        x_pool = pool_ops(x_view, self.pool_types, w)
        valid = a_sum > 0.0
        out = MLP(self.n_dims2, (), self.nl_layer, self.weight_norm,
                  dtype=self.dtype, name="layers2")(x_pool)
        return out, valid, x_view, x_pool


# --------------------------------------------------------------- conv nets

def _group_norm(ch: int, name: str):
    return nn.GroupNorm(num_groups=min(32, ch), name=name)


class HGConvBlock(nn.Module):
    """Pre-activation 3-branch conv block (keypointnerf_util.py:451-509)."""

    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_p = x.shape[-1]
        op = self.out_planes
        h1 = nn.Conv(op // 2, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                     dtype=self.dtype, name="conv1")(
            nn.relu(_group_norm(in_p, "bn1")(x)))
        h2 = nn.Conv(op // 4, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                     dtype=self.dtype, name="conv2")(
            nn.relu(_group_norm(op // 2, "bn2")(h1)))
        h3 = nn.Conv(op // 4, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                     dtype=self.dtype, name="conv3")(
            nn.relu(_group_norm(op // 4, "bn3")(h2)))
        out = jnp.concatenate([h1, h2, h3], axis=-1)
        if in_p != op:
            res = nn.Conv(op, (1, 1), use_bias=False, dtype=self.dtype,
                          name="downsample_conv")(
                nn.relu(_group_norm(in_p, "bn4")(x)))
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    """Recursive hourglass with bicubic skip upsample
    (keypointnerf_util.py:296-343)."""

    depth: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def level(lv, inp):
            up1 = HGConvBlock(self.features, self.dtype,
                              name=f"b1_{lv}")(inp)
            low = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low = HGConvBlock(self.features, self.dtype,
                              name=f"b2_{lv}")(low)
            if lv > 1:
                low = level(lv - 1, low)
            else:
                low = HGConvBlock(self.features, self.dtype,
                                  name=f"b2_plus_{lv}")(low)
            low = HGConvBlock(self.features, self.dtype,
                              name=f"b3_{lv}")(low)
            up2 = resize_bicubic_align_corners(
                low, low.shape[-3] * 2, low.shape[-2] * 2)
            return up1 + up2

        return level(self.depth, x)


class DeconvReLUGroup(nn.Module):
    """k3/s2 transpose conv + GroupNorm + ReLU (keypointnerf_util.py:346-355)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad_cfg = [(0, 0, 0), (1, 2, 1), (1, 2, 1), (0, 0, 0)]
        z = jax.lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)
        y = nn.Conv(self.out_ch, (3, 3), padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv")(z)
        return nn.relu(_group_norm(self.out_ch, "norm")(y))


class HGFilterV2(nn.Module):
    """Stacked-hourglass geometry encoder (keypointnerf_util.py:357-449).

    Input (N, H, W, 3) in [-1, 1]. Returns [coarse (H/4, out_ch),
    x_hd (H/1, out_ch_hd=8)] — the two skip-feature levels the fusion MLP
    consumes.
    """

    out_ch: int = 64
    n_stack: int = 1
    n_downsample: int = 4
    out_ch_hd: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_group_norm(64, "bn1")(h))
        h = HGConvBlock(128, self.dtype, name="conv2")(h)

        x_hd = DeconvReLUGroup(32, self.dtype, name="unpack1")(h)
        x_hd = nn.Conv(self.out_ch_hd, (5, 5), padding=[(2, 2)] * 2,
                       dtype=self.dtype, name="conv_out")(x_hd)

        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = HGConvBlock(128, self.dtype, name="conv3")(h)
        h = HGConvBlock(256, self.dtype, name="conv4")(h)

        previous = h
        out = None
        for i in range(self.n_stack):
            hg = HourGlass(self.n_downsample, 256, self.dtype,
                           name=f"m{i}")(previous)
            ll = HGConvBlock(256, self.dtype, name=f"top_m_{i}")(hg)
            ll = nn.relu(_group_norm(256, f"bn_end{i}")(
                nn.Conv(256, (1, 1), dtype=self.dtype,
                        name=f"conv_last{i}")(ll)))
            tmp = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                          name=f"l{i}")(ll)
            out = tmp
            if i < self.n_stack - 1:
                bl = nn.Conv(256, (1, 1), dtype=self.dtype,
                             name=f"bl{i}")(ll)
                al = nn.Conv(256, (1, 1), dtype=self.dtype,
                             name=f"al{i}")(tmp)
                previous = previous + bl + al
        return [out, x_hd]


def _instance_norm(x):
    """InstanceNorm2d(affine=False): per-sample per-channel over H, W."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


def _rep_pad(x, p: int):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")


class ResBlkEncoder(nn.Module):
    """Texture feature encoder (keypointnerf_util.py:251-294): instance-norm
    conv encoder, residual blocks, transpose-conv upsampling."""

    out_ch: int = 8
    ngf: int = 64
    n_downsample: int = 3
    n_blocks: int = 4
    n_upsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=self.dtype,
                    name="conv_in")(_rep_pad(x, 3))
        h = nn.relu(_instance_norm(h))
        for i in range(self.n_downsample):
            mult = 2 ** i
            h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f"down_{i}")(h)
            h = nn.relu(_instance_norm(h))
        mult = 2 ** self.n_downsample
        for i in range(self.n_blocks):
            r = nn.Conv(self.ngf * mult, (3, 3), padding="VALID",
                        dtype=self.dtype, name=f"res_{i}_conv1")(_rep_pad(h, 1))
            r = nn.relu(_instance_norm(r))
            r = nn.Conv(self.ngf * mult, (3, 3), padding="VALID",
                        dtype=self.dtype, name=f"res_{i}_conv2")(_rep_pad(r, 1))
            h = h + _instance_norm(r)
        for i in range(self.n_upsample):
            mult = 2 ** (self.n_downsample - i)
            pad_cfg = [(0, 0, 0), (1, 2, 1), (1, 2, 1), (0, 0, 0)]
            z = jax.lax.pad(h, jnp.zeros((), h.dtype), pad_cfg)
            h = nn.Conv((self.ngf * mult) // 2, (3, 3), padding="VALID",
                        dtype=self.dtype, name=f"up_{i}")(z)
            h = nn.relu(_instance_norm(h))
        if self.n_upsample > 0:
            h = nn.Conv(self.out_ch, (7, 7), padding="VALID",
                        dtype=self.dtype, name="conv_out")(_rep_pad(h, 3))
        return h


class IBRRenderingHead(nn.Module):
    """IBRNet-style color head (keypointnerf.py:1292-1355): anisotropy-
    weighted mean/variance fusion, visibility refinement, per-view softmax
    color blending."""

    in_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb_feats, ray_diffs, proj_mask):
        """rgb_feats (R, S, V, 3+F), ray_diffs (R, S, V, 4),
        proj_mask (R, S, V, 1) → color (R, S, 3)."""
        def seq(dims, x, name, last_act=True):
            for i, d in enumerate(dims):
                x = nn.Dense(d, dtype=self.dtype, name=f"{name}_{i}")(x)
                if last_act or i < len(dims) - 1:
                    x = nn.elu(x)
            return x

        ani_al = self.param("ani_al", lambda k: jnp.asarray(0.2))
        dir_feat = seq([16, self.in_channels + 3], ray_diffs, "ray_encoder")
        src_rgb = rgb_feats[..., :3]
        d = dir_feat.shape[-1]
        rgb_feats = jnp.concatenate(
            [rgb_feats[..., :d] + dir_feat, rgb_feats[..., d:]], axis=-1)

        dot = ray_diffs[..., 3:4]
        exp_dot = jnp.exp(jnp.abs(ani_al) * (dot - 1.0))
        weight = (exp_dot - jnp.min(exp_dot, axis=2, keepdims=True)) * proj_mask
        weight = weight / (jnp.sum(weight, axis=2, keepdims=True) + 1e-8)

        mean = jnp.sum(rgb_feats * weight, axis=2, keepdims=True)
        var = jnp.sum(weight * (rgb_feats - mean) ** 2, axis=2, keepdims=True)
        fused = jnp.concatenate([mean, var], axis=-1)
        V = rgb_feats.shape[2]
        x = seq([64, 32], jnp.concatenate(
            [jnp.broadcast_to(fused, fused.shape[:2] + (V, fused.shape[-1])),
             rgb_feats], axis=-1), "base_layer")

        pred_vis = seq([32, 33], x * weight, "vis_layer1")
        res, vis = pred_vis[..., :-1], pred_vis[..., -1:]
        x = x + res
        vis = nn.sigmoid(
            nn.Dense(1, dtype=self.dtype, name="vis_layer2_1")(
                nn.elu(nn.Dense(32, dtype=self.dtype,
                                name="vis_layer2_0")(
                    x * nn.sigmoid(vis) * proj_mask)))) * proj_mask

        h = jnp.concatenate([x, vis, ray_diffs], axis=-1)
        h = nn.elu(nn.Dense(16, dtype=self.dtype, name="out_layer_0")(h))
        h = nn.elu(nn.Dense(8, dtype=self.dtype, name="out_layer_1")(h))
        logits = nn.Dense(1, dtype=self.dtype, name="out_layer_2")(h)
        logits = jnp.where(proj_mask == 0, -1e9, logits)
        return jnp.sum(src_rgb * jax.nn.softmax(logits, axis=2), axis=2)


def keypoint_position_embedding(x, nlevels: int, scale: float = 1.0):
    """KeypointNeRF PE layout (spatial_encoder.py:24-47): per level l,
    [sin(f_l·x) (C), cos(f_l·x) (C)], prefixed by x itself."""
    if nlevels <= 0:
        return x
    freqs = scale * math.pi * (2.0 ** jnp.arange(nlevels, dtype=x.dtype))
    y = x[..., None, :] * freqs[:, None]  # (..., L, C)
    z = jnp.concatenate([jnp.sin(y), jnp.cos(y)], axis=-1)  # (..., L, 2C)
    z = z.reshape(x.shape[:-1] + (-1,))
    return jnp.concatenate([x, z], axis=-1)


def rel_z_decay_encoding(cxyz, kpt_cam, sp_level: int, scale: float,
                         sigma: float):
    """``rel_z_decay`` spatial keypoint encoding (spatial_encoder.py:108-117):
    per-keypoint camera-z differences, positionally encoded, modulated by a
    Gaussian falloff on 3-D keypoint distance.

    cxyz: (BV, N, 3) camera-space points; kpt_cam: (BV, K, 3) camera-space
    keypoints. Returns (BV, N, (1+2·sp_level)·K).
    """
    dz = scale * (cxyz[:, :, None, 2] - kpt_cam[:, None, :, 2])  # (BV, N, K)
    dxyz = cxyz[:, :, None] - kpt_cam[:, None]
    w = jnp.exp(-jnp.sum(dxyz ** 2, axis=-1) / (2.0 * sigma ** 2))  # (BV,N,K)
    out = keypoint_position_embedding(dz, sp_level)  # (BV, N, (1+2L)·K)
    K = kpt_cam.shape[1]
    out = out.reshape(out.shape[:2] + (-1, K)) * w[:, :, None]
    return out.reshape(out.shape[:2] + (-1,))
