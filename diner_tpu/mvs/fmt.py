"""Feature-Matching Transformer (linear attention), flax.

Parity target: reference ``deps/TransMVSNet/models/FMT.py`` +
``position_encoding.py`` — ELU+1 linear attention (O(N) KV-trick einsums,
natively MXU-shaped), inter/intra-view layer sequence ['self','cross']×4 at
stage 1, results propagated down the FPN pathway with 1×1 dim-reduction +
bilinear upsample-add + 3×3 smoothing.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from diner_tpu.utils.resize import resize_linear_2d


def linear_attention(q, k, v, eps: float = 1e-6):
    """ELU+1 linear attention. q: (N, L, H, D), k/v: (N, S, H, D/M)."""
    Q = nn.elu(q) + 1.0
    K = nn.elu(k) + 1.0
    kv = jnp.einsum("nshd,nshm->nhmd", K, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    return jnp.einsum("nlhd,nhmd,nlh->nlhm", Q, kv, z)


class AttentionLayer(nn.Module):
    d_model: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, values):
        N, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        dk = self.d_model // H
        q = nn.Dense(dk * H, dtype=self.dtype,
                     name="query_projection")(queries).reshape(N, L, H, dk)
        k = nn.Dense(dk * H, dtype=self.dtype,
                     name="key_projection")(keys).reshape(N, S, H, dk)
        v = nn.Dense(dk * H, dtype=self.dtype,
                     name="value_projection")(values).reshape(N, S, H, dk)
        out = linear_attention(q, k, v).reshape(N, L, H * dk)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        name="out_projection")(out)


class EncoderLayer(nn.Module):
    d_model: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, source):
        x = x + AttentionLayer(self.d_model, self.n_heads, self.dtype,
                               name="attention")(x, source, source)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = nn.Dense(2 * self.d_model, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


def sine_position_encoding_2d(d_model: int, H: int, W: int, dtype=jnp.float32):
    """LoFTR-style 2-D sine PE (temp_bug_fix variant), (H, W, d_model)."""
    ys = jnp.arange(1, H + 1, dtype=dtype)[:, None] * jnp.ones((1, W), dtype)
    xs = jnp.ones((H, 1), dtype) * jnp.arange(1, W + 1, dtype=dtype)[None]
    div = jnp.exp(jnp.arange(0, d_model // 2, 2, dtype=dtype)
                  * (-math.log(10000.0) / (d_model // 2)))  # (C//4,)
    pe = jnp.zeros((H, W, d_model), dtype)
    pe = pe.at[..., 0::4].set(jnp.sin(xs[..., None] * div))
    pe = pe.at[..., 1::4].set(jnp.cos(xs[..., None] * div))
    pe = pe.at[..., 2::4].set(jnp.sin(ys[..., None] * div))
    pe = pe.at[..., 3::4].set(jnp.cos(ys[..., None] * div))
    return pe


class PositionEncodingSuperGlue(nn.Module):
    """SuperGlue-style learned positional encoding.

    Parity target: reference ``deps/TransMVSNet/models/position_encoding.py:6-21``
    (``PositionEncodingSuperGule`` + ``KeypointEncoder`` :89-99 + ``MLP``
    :63-75 + ``normalize_keypoints`` :78-86): pixel-index keypoints
    normalized by ``(kpts − size/2) / (0.7·max(W,H))``, then a
    Conv1d(k=1)+BN+ReLU MLP ``[2] + [32, 64] + [d_model]`` (no BN/ReLU on
    the last layer, zero-init last bias), added to the feature map. The
    reference instantiates it but ships with the sine variant enabled
    (``FMT.py:125-126``); exposed here via ``FMT(pe_type='superglue')``.

    Input/output channels-last (N, H, W, C).
    """

    d_model: int = 32
    mlp_layers: Sequence[int] = (32, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, H, W, C = x.shape
        xs = jnp.arange(W, dtype=jnp.float32)
        ys = jnp.arange(H, dtype=jnp.float32)
        kpts = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (H, W)),
             jnp.broadcast_to(ys[:, None], (H, W))], axis=-1)  # (H, W, 2)
        size = jnp.asarray([W, H], jnp.float32)
        scaling = 0.7 * jnp.max(size)
        p = (kpts - size / 2.0) / scaling
        h = p.reshape(1, H * W, 2).astype(self.dtype)
        for i, ch in enumerate(self.mlp_layers):
            h = nn.Dense(ch, dtype=self.dtype, name=f"mlp_{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"bn_{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     bias_init=nn.initializers.zeros, name="mlp_out")(h)
        return x + h.reshape(1, H, W, self.d_model).astype(x.dtype)


class FMT(nn.Module):
    """Ref path: self-attention stack returning per-layer features; src path:
    alternating self / cross(ref) layers. Inputs channels-last (N, H, W, C).

    ``pe_type``: 'sine' (reference default, ``FMT.py:126``) or 'superglue'
    (the learned keypoint-MLP variant, ``FMT.py:125``)."""

    d_model: int = 32
    n_heads: int = 8
    layer_names: Sequence[str] = ("self", "cross") * 4
    pe_type: str = "sine"
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [EncoderLayer(self.d_model, self.n_heads, self.dtype,
                                    name=f"layer_{i}")
                       for i in range(len(self.layer_names))]
        if self.pe_type == "superglue":
            self.pos_encoding = PositionEncodingSuperGlue(
                self.d_model, dtype=self.dtype, name="pos_encoding")
        elif self.pe_type != "sine":
            raise ValueError(f"unknown pe_type {self.pe_type!r}")

    def _flatten_pe(self, feat):
        N, H, W, C = feat.shape
        if self.pe_type == "superglue":
            return self.pos_encoding(feat).reshape(N, H * W, C)
        pe = sine_position_encoding_2d(C, H, W, feat.dtype)
        return (feat + pe).reshape(N, H * W, C)

    def ref_forward(self, ref_feature) -> List[jnp.ndarray]:
        N, H, W, C = ref_feature.shape
        x = self._flatten_pe(ref_feature)
        outs = []
        for layer, name in zip(self.layers, self.layer_names):
            if name == "self":
                x = layer(x, x)
                outs.append(x.reshape(N, H, W, C))
        return outs

    def src_forward(self, ref_feature_list, src_feature):
        N, H, W, C = src_feature.shape
        refs = [r.reshape(N, H * W, C) for r in ref_feature_list]
        x = self._flatten_pe(src_feature)
        for i, (layer, name) in enumerate(zip(self.layers, self.layer_names)):
            if name == "self":
                x = layer(x, x)
            elif name == "cross":
                x = layer(x, refs[i // 2])
            else:
                raise KeyError(name)
        return x.reshape(N, H, W, C)

    def __call__(self, ref_feature):  # init path
        return self.ref_forward(ref_feature)


class FMTWithPathway(nn.Module):
    """Apply FMT at stage 1 and propagate down the feature pyramid."""

    base_channels: int = 8
    pe_type: str = "sine"
    dtype: Any = jnp.float32

    def setup(self):
        bc = self.base_channels
        self.fmt = FMT(d_model=4 * bc, pe_type=self.pe_type,
                       dtype=self.dtype, name="FMT")
        self.dim_reduction_1 = nn.Conv(2 * bc, (1, 1), use_bias=False,
                                       dtype=self.dtype)
        self.dim_reduction_2 = nn.Conv(bc, (1, 1), use_bias=False,
                                       dtype=self.dtype)
        self.smooth_1 = nn.Conv(2 * bc, (3, 3), padding=[(1, 1)] * 2,
                                use_bias=False, dtype=self.dtype)
        self.smooth_2 = nn.Conv(bc, (3, 3), padding=[(1, 1)] * 2,
                                use_bias=False, dtype=self.dtype)

    def _upsample_add(self, x, y):
        H, W = y.shape[-3:-1]
        return resize_linear_2d(x, H, W, align_corners=False) + y

    def __call__(self, features: List[dict]) -> List[dict]:
        """features: per-view dicts {"stage1","stage2","stage3"} (NHWC)."""
        out = []
        ref_list = None
        for vi, f in enumerate(features):
            f = dict(f)
            if vi == 0:
                ref_list = self.fmt.ref_forward(f["stage1"])
                f["stage1"] = ref_list[-1]
            else:
                f["stage1"] = self.fmt.src_forward(ref_list, f["stage1"])
            f["stage2"] = self.smooth_1(self._upsample_add(
                self.dim_reduction_1(f["stage1"]), f["stage2"]))
            f["stage3"] = self.smooth_2(self._upsample_add(
                self.dim_reduction_2(f["stage2"]), f["stage3"]))
            out.append(f)
        return out
