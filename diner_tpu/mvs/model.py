"""TransMVSNet — coarse-to-fine multi-view-stereo depth estimation (flax).

Parity target: reference ``deps/TransMVSNet/models/TransMVSNet.py`` +
``module.py``:
  - FeatureNet FPN (strides 1/2/2) with deformable-conv output heads at all
    3 scales (module.py:343-421)
  - FMT linear-attention pathway (FMT.py)
  - per-stage: depth-hypothesis ranges around the prior depth
    (module.py:590-619), plane-sweep homography cost volume with
    PixelwiseNet visibility weights (TransMVSNet.py:9-106), 3-D UNet cost
    regularization (module.py:424-455), softmax probability volume,
    winner-take-all depth + per-pixel photometric confidence.

Channels-last throughout; stage scales 4/2/1 with ndepths [48, 32, 8]
(DTU) or [96, 64, 16] (Facescape) via config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diner_tpu.mvs.blocks import (
    ConvBnReLU,
    ConvBnReLU3D,
    DeconvBnReLU3D,
    TapConvOut1,
)
from diner_tpu.mvs.dcn import DeformConv2d
from diner_tpu.mvs.fmt import FMTWithPathway
from diner_tpu.mvs.homography import homo_warping
from diner_tpu.utils.resize import (
    resize_linear_2d,
    resize_nearest_2x,
    resize_trilinear,
)


@dataclass(frozen=True)
class TransMVSNetConfig:
    ndepths: Tuple[int, ...] = (48, 32, 8)
    depth_intervals_ratio: Tuple[float, ...] = (4.0, 2.0, 1.0)
    base_channels: int = 8
    cr_base_chs: Tuple[int, ...] = (8, 8, 8)
    grad_method: str = "detach"
    # FMT positional encoding: 'sine' (reference default, FMT.py:126) or
    # 'superglue' (the learned keypoint-MLP variant, FMT.py:125)
    fmt_pe_type: str = "sine"
    # depth planes per plane-sweep scan step (memory/speed trade: the
    # (B, chunk, H, W, C) warped group is the live buffer; 8 fits full-res
    # DTU training in HBM, larger chunks amortize scan overhead)
    sweep_chunk: int = 8
    # rematerialize FeatureNet / the warp+correlation / CostRegNet in
    # backward. The full 512x640 DTU training graph needs ~46 GB of
    # activations without it (the reference trains on an A100-80GB); remat
    # + bf16 fits it on a 16 GB chip at identical numerics (recompute).
    remat: bool = False
    # selective remat (remat=True, remat_feature=False): keep FeatureNet's
    # activations resident and remat only the plane-sweep + CostRegNet.
    # FeatureNet's backward is ~80% of the full-res step
    # (MVS_ROOFLINE_r04); under full remat its 2.1 s forward is re-run in
    # backward, while its (H, W, C<=32) pyramid activations are MBs —
    # the memory-dominant (D, H, W) sweep volumes are what remat is for.
    remat_feature: bool = True

    @property
    def num_stage(self) -> int:
        return len(self.ndepths)


class FeatureNet(nn.Module):
    """FPN with DCN heads. Input (N, H, W, 3) → stage1 (H/4, 4bc),
    stage2 (H/2, 2bc), stage3 (H, bc)."""

    base_channels: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bc = self.base_channels
        conv0 = ConvBnReLU(bc, 3, dtype=self.dtype, name="conv0_0")(x, train)
        conv0 = ConvBnReLU(bc, 3, dtype=self.dtype, name="conv0_1")(conv0, train)
        conv1 = ConvBnReLU(2 * bc, 5, stride=2, padding=2,
                           dtype=self.dtype, name="conv1_0")(conv0, train)
        conv1 = ConvBnReLU(2 * bc, 3, dtype=self.dtype, name="conv1_1")(conv1, train)
        conv1 = ConvBnReLU(2 * bc, 3, dtype=self.dtype, name="conv1_2")(conv1, train)
        conv2 = ConvBnReLU(4 * bc, 5, stride=2, padding=2,
                           dtype=self.dtype, name="conv2_0")(conv1, train)
        conv2 = ConvBnReLU(4 * bc, 3, dtype=self.dtype, name="conv2_1")(conv2, train)
        conv2 = ConvBnReLU(4 * bc, 3, dtype=self.dtype, name="conv2_2")(conv2, train)

        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(h)

        # out1: 1x1 conv + 3 DCNs with BN+ReLU between
        h = ConvBnReLU(4 * bc, 1, padding=0, dtype=self.dtype, name="out1_conv")(conv2, train)
        h = nn.relu(bn(DeformConv2d(4 * bc, dtype=self.dtype, name="out1_dcn0")(h), "out1_bn0"))
        h = nn.relu(bn(DeformConv2d(4 * bc, dtype=self.dtype, name="out1_dcn1")(h), "out1_bn1"))
        stage1 = DeformConv2d(4 * bc, dtype=self.dtype, name="out1_dcn2")(h)

        intra = resize_nearest_2x(conv2) + nn.Conv(
            4 * bc, (1, 1), dtype=self.dtype, name="inner1")(conv1)
        h = ConvBnReLU(4 * bc, 3, dtype=self.dtype, name="out2_conv")(intra, train)
        h = nn.relu(bn(DeformConv2d(4 * bc, dtype=self.dtype, name="out2_dcn0")(h), "out2_bn0"))
        h = nn.relu(bn(DeformConv2d(4 * bc, dtype=self.dtype, name="out2_dcn1")(h), "out2_bn1"))
        stage2 = DeformConv2d(2 * bc, dtype=self.dtype, name="out2_dcn2")(h)

        intra = resize_nearest_2x(intra) + nn.Conv(
            4 * bc, (1, 1), dtype=self.dtype, name="inner2")(conv0)
        h = ConvBnReLU(4 * bc, 3, dtype=self.dtype, name="out3_conv")(intra, train)
        h = nn.relu(bn(DeformConv2d(4 * bc, dtype=self.dtype, name="out3_dcn0")(h), "out3_bn0"))
        h = nn.relu(bn(DeformConv2d(4 * bc, dtype=self.dtype, name="out3_dcn1")(h), "out3_bn1"))
        stage3 = DeformConv2d(bc, dtype=self.dtype, name="out3_dcn2")(h)

        return {"stage1": stage1, "stage2": stage2, "stage3": stage3}


class PixelwiseNet(nn.Module):
    """Per-view visibility weight from the similarity volume.
    Input (B, D, H, W, 1) → (B, 1, H, W, 1)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # x: (B, D, H, W) squeezed similarity — the C_in=1 first conv and
        # C_out=1 last conv run as tap equivalents so no (…, 1)-singleton
        # (×128 TPU lane padding) is ever materialized
        x = ConvBnReLU3D(16, 1, padding=0, dtype=self.dtype,
                         name="conv0")(x, train)
        x = ConvBnReLU3D(8, 1, padding=0, dtype=self.dtype,
                         name="conv1")(x, train)
        x = TapConvOut1(kernel=1, use_bias=True, dtype=self.dtype,
                        name="conv2")(x)
        x = nn.sigmoid(x)  # (B, D, H, W)
        return jnp.max(x, axis=1, keepdims=True)  # (B, 1, H, W)


class CostRegNet(nn.Module):
    """3-D UNet cost regularization. (B, D, H, W) → (B, D, H, W).

    Input and output are CHANNEL-FREE volumes: the reference's C_in = 1 /
    C_out = 1 convs (module.py:424-455) run as tap-sum equivalents
    (blocks.TapConvIn1/Out1, identical params + math) because a trailing
    singleton dim is lane-padded ×128+ on TPU — the two largest
    allocations of the full-res training graph (1.25 GB each on 5 MB of
    payload) were exactly the (B,D,H,W,1) tensors at this boundary.
    """

    base_channels: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        bc = self.base_channels
        dt = self.dtype
        c0 = ConvBnReLU3D(bc, dtype=dt, name="conv0")(x, train)
        c2 = ConvBnReLU3D(2 * bc, stride=2, dtype=dt, name="conv1")(c0, train)
        c2 = ConvBnReLU3D(2 * bc, dtype=dt, name="conv2")(c2, train)
        c4 = ConvBnReLU3D(4 * bc, stride=2, dtype=dt, name="conv3")(c2, train)
        c4 = ConvBnReLU3D(4 * bc, dtype=dt, name="conv4")(c4, train)
        h = ConvBnReLU3D(8 * bc, stride=2, dtype=dt, name="conv5")(c4, train)
        h = ConvBnReLU3D(8 * bc, dtype=dt, name="conv6")(h, train)
        h = c4 + DeconvBnReLU3D(4 * bc, dtype=dt, name="conv7")(h, train)
        h = c2 + DeconvBnReLU3D(2 * bc, dtype=dt, name="conv9")(h, train)
        h = c0 + DeconvBnReLU3D(bc, dtype=dt, name="conv11")(h, train)
        return TapConvOut1(dtype=self.dtype, name="prob")(h)


def get_depth_range_samples(cur_depth, ndepth: int, depth_interval_pixel,
                            shape):
    """Per-stage hypothesis depths (module.py:590-619).

    cur_depth: (B, D0) global range at stage 1 or (B, H, W) prior depth.
    Returns (B, ndepth, H, W).
    """
    B, H, W = shape
    idx = jnp.arange(ndepth, dtype=jnp.float32)
    if cur_depth.ndim == 2:
        dmin = cur_depth[:, 0]
        dmax = cur_depth[:, -1]
        interval = (dmax - dmin) / (ndepth - 1)
        samples = dmin[:, None] + idx[None] * interval[:, None]  # (B, D)
        return jnp.broadcast_to(samples[:, :, None, None], (B, ndepth, H, W))
    dmin = cur_depth - ndepth / 2 * depth_interval_pixel  # (B, H, W)
    dmax = cur_depth + ndepth / 2 * depth_interval_pixel
    interval = (dmax - dmin) / (ndepth - 1)
    return dmin[:, None] + idx[:, None, None] * interval[:, None]


def depth_wta(prob_volume, depth_values):
    """Winner-take-all depth. prob (B, D, H, W); depths (B, D, H, W)."""
    idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    return jnp.take_along_axis(depth_values, idx, axis=1)[:, 0]


class DepthNet(nn.Module):
    """One cascade stage: warped-similarity cost volume + regularization."""

    dtype: Any = jnp.float32
    remat: bool = False
    sweep_chunk: int = 8  # depth planes per plane-sweep scan step

    def setup(self):
        self.pixel_wise_net = PixelwiseNet(dtype=self.dtype)

    def __call__(self, features: List, proj_matrices, depth_values,
                 cost_regularization, view_weights=None, train: bool = True):
        """
        features: per-view (B, H, W, C); proj_matrices: (B, V, 2, 4, 4)
        [extrinsics, intrinsics]; depth_values: (B, D, H, W).
        view_weights: (B, V-1, H, W) or None (stage 1 computes them).
        Returns (outputs dict, view_weights).
        """
        ref_feature = features[0]
        B, H, W, C = ref_feature.shape
        D = depth_values.shape[1]

        def full_proj(pm):
            pm = jnp.asarray(pm)  # accept host numpy
            ext = pm[:, 0]
            out = ext.at[:, :3, :4].set(
                jnp.einsum("bij,bjk->bik", pm[:, 1, :3, :3], ext[:, :3, :4],
                           precision="highest"))
            return out

        ref_proj = full_proj(proj_matrices[:, 0])
        dv_flat = depth_values.reshape(B, D, H * W)

        def warp_similarity(src_fea, ref_fea, src_proj, ref_proj, dvf):
            # DEPTH-CHUNKED plane sweep: never materializes the full
            # (B, D, H, W, C) warped volume or its backward copies — at
            # 512×640 stage 2 those were four 1.25 GB lane-padded
            # f32[2.6M, 16] buffers (the HBM peak). A lax.scan over
            # depth chunks keeps one (B, chunk, H, W, C) plane group
            # live at a time; the gathers dominate the cost either way
            # so the sequentialization is ~free.
            D_ = dvf.shape[1]
            chunk = D_ if D_ <= self.sweep_chunk else self.sweep_chunk
            if D_ % chunk:  # 48/32/8 (DTU) and 96/64/16 (FS) divide by 8/16
                chunk = 1
            dv = dvf.reshape(B, D_ // chunk, chunk, H * W)
            dv = jnp.moveaxis(dv, 1, 0)  # (nchunks, B, chunk, HW)

            def body(_, dv_c):
                warped = homo_warping(src_fea, src_proj, ref_proj,
                                      dv_c)  # (B, chunk, H, W, C)
                # squeeze the channel immediately: a trailing 1 would be
                # lane-padded x128
                return 0.0, jnp.mean(warped * ref_fea[:, None], axis=-1)

            _, sims = jax.lax.scan(body, 0.0, dv)
            return jnp.moveaxis(sims, 0, 1).reshape(B, D_, H, W)

        if self.remat:
            # don't keep the warped plane groups for backward; recompute
            # the plane-sweep in the bwd pass
            warp_similarity = jax.checkpoint(warp_similarity)

        similarity_sum = 0.0
        weight_sum = 1e-5
        new_weights = []
        for i, src_fea in enumerate(features[1:]):
            src_proj = full_proj(proj_matrices[:, i + 1])
            similarity = warp_similarity(src_fea, ref_feature, src_proj,
                                         ref_proj, dv_flat)  # (B, D, H, W)
            if view_weights is None:
                w = self.pixel_wise_net(similarity, train)  # (B, 1, H, W)
                new_weights.append(w[:, 0])
            else:
                w = view_weights[:, i, None]
            similarity_sum = similarity_sum + similarity * w
            weight_sum = weight_sum + w
        similarity = similarity_sum / weight_sum  # (B, D, H, W)

        cost_reg = cost_regularization(similarity, train)  # (B, D, H, W)
        prob_volume = jax.nn.softmax(cost_reg, axis=1)
        depth = depth_wta(prob_volume, depth_values)
        confidence = jax.lax.stop_gradient(jnp.max(prob_volume, axis=1))

        out = {"depth": depth, "photometric_confidence": confidence,
               "prob_volume": prob_volume, "depth_values": depth_values}
        if view_weights is None:
            view_weights = jax.lax.stop_gradient(
                jnp.stack(new_weights, axis=1))  # (B, V-1, H, W)
        return out, view_weights


class TransMVSNet(nn.Module):
    cfg: TransMVSNetConfig = TransMVSNetConfig()
    dtype: Any = jnp.float32

    def setup(self):
        feature_cls = FeatureNet
        cost_cls = CostRegNet
        if self.cfg.remat:
            # identical numerics; activations recomputed in backward
            # (train flag is static: call-arg index 2 incl. the module)
            if self.cfg.remat_feature:
                feature_cls = nn.remat(FeatureNet, static_argnums=(2,))
            cost_cls = nn.remat(CostRegNet, static_argnums=(2,))
        self.feature = feature_cls(self.cfg.base_channels, dtype=self.dtype)
        self.fmt_pathway = FMTWithPathway(self.cfg.base_channels,
                                          pe_type=self.cfg.fmt_pe_type,
                                          dtype=self.dtype,
                                          name="FMT_with_pathway")
        self.cost_regularization = [
            cost_cls(self.cfg.cr_base_chs[i], dtype=self.dtype,
                     name=f"cost_reg_{i}")
            for i in range(self.cfg.num_stage)]
        self.depth_net = DepthNet(dtype=self.dtype, remat=self.cfg.remat,
                                  sweep_chunk=self.cfg.sweep_chunk)

    def __call__(self, imgs, proj_matrices: Dict[str, jnp.ndarray],
                 depth_values, train: bool = True) -> Dict:
        """
        imgs: (B, V, H, W, 3); proj_matrices: {"stageK": (B, V, 2, 4, 4)};
        depth_values: (B, D0) global depth range samples.
        """
        cfg = self.cfg
        B, V, H, W, _ = imgs.shape
        depth_min = depth_values[:, 0]
        depth_max = depth_values[:, -1]
        depth_interval = (depth_max[0] - depth_min[0]) / depth_values.shape[1]

        # One batched FeatureNet call over (B·V, H, W, 3) instead of the
        # reference's per-view loop (TransMVSNet.py:158-161): identical with
        # frozen BN stats, ~V× smaller compiled graph, and the MXU sees one
        # large batch. (Train-mode BN normalizes over B·V pooled views
        # instead of per view — a deliberate deviation, documented; the
        # reference never syncs BN across its DDP replicas either.)
        feats_all = self.feature(
            imgs.reshape((B * V,) + imgs.shape[2:]), train)
        features = [
            {k: f.reshape((B, V) + f.shape[1:])[:, v]
             for k, f in feats_all.items()}
            for v in range(V)
        ]
        features = self.fmt_pathway(features)

        outputs: Dict = {}
        depth = None
        view_weights = None
        for stage_idx in range(cfg.num_stage):
            stage = f"stage{stage_idx + 1}"
            feats = [f[stage] for f in features]
            projs = proj_matrices[stage]
            scale = int(2 ** (cfg.num_stage - 1 - stage_idx))

            if depth is not None:
                if cfg.grad_method == "detach":
                    depth = jax.lax.stop_gradient(depth)
                cur_depth = resize_linear_2d(
                    depth[..., None], H, W, align_corners=False)[..., 0]
            else:
                cur_depth = depth_values

            drs = get_depth_range_samples(
                cur_depth, cfg.ndepths[stage_idx],
                cfg.depth_intervals_ratio[stage_idx] * depth_interval,
                (B, H, W))  # (B, D, H, W)
            dv = resize_trilinear(
                drs[..., None], cfg.ndepths[stage_idx], H // scale,
                W // scale, align_corners=False)[..., 0]

            if stage_idx > 0:
                view_weights = jnp.repeat(
                    jnp.repeat(view_weights, 2, axis=-2), 2, axis=-1)

            out_stage, view_weights = self.depth_net(
                feats, projs, dv, self.cost_regularization[stage_idx],
                view_weights=view_weights if stage_idx > 0 else None,
                train=train)
            depth = out_stage["depth"]
            outputs[stage] = out_stage
        outputs.update(outputs[f"stage{cfg.num_stage}"])
        return outputs
