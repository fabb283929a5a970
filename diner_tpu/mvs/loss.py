"""TransMVSNet losses.

Parity target: reference ``deps/TransMVSNet/models/module.py:480-587`` —
masked cross-entropy on the depth-bin one-hot (entropy_loss), per-stage
weighted sum (trans_mvsnet_loss), smooth-L1 depth metric, focal_loss_bld
metrics for BlendedMVS, info_entropy_loss.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def smooth_l1(pred, target):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5)


def _masked_mean(x, mask):
    denom = jnp.sum(mask) + 1e-6
    return jnp.sum(x * mask) / denom


def entropy_loss(prob_volume, depth_gt, mask, depth_values):
    """Masked cross-entropy against the nearest depth bin.

    prob_volume: (B, D, H, W) post-softmax; depth_gt: (B, H, W);
    mask: (B, H, W) bool; depth_values: (B, D) or (B, D, H, W).
    Returns (loss, wta_depth).
    """
    B, D = prob_volume.shape[:2]
    if depth_values.ndim == 2:
        dv = depth_values[:, :, None, None] * jnp.ones_like(prob_volume)
    else:
        dv = depth_values
    gt_idx = jnp.argmin(jnp.abs(dv - depth_gt[:, None]), axis=1)  # (B,H,W)
    gt_idx = jnp.round(mask.astype(jnp.float32) * gt_idx).astype(jnp.int32)
    gt_onehot = jax.nn.one_hot(gt_idx, D, axis=1, dtype=prob_volume.dtype)

    ce = -jnp.sum(gt_onehot * jnp.log(prob_volume + 1e-6), axis=1)  # (B,H,W)
    maskf = mask.astype(prob_volume.dtype)
    valid = jnp.sum(maskf, axis=(1, 2)) + 1e-6
    loss = jnp.mean(jnp.sum(ce * maskf, axis=(1, 2)) / valid)

    wta_idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    wta_depth = jnp.take_along_axis(dv, wta_idx, axis=1)[:, 0]
    return loss, wta_depth


def info_entropy_loss(prob_volume, prob_volume_pre, mask):
    """Entropy of the prob volume against its own logits (module.py:480)."""
    lsm = jax.nn.log_softmax(prob_volume_pre, axis=1)
    entropy = -jnp.sum(prob_volume * lsm, axis=1)  # (B, H, W)
    maskf = mask.astype(prob_volume.dtype)
    valid = jnp.sum(maskf, axis=(1, 2)) + 1e-6
    return jnp.mean(jnp.sum(entropy * maskf, axis=(1, 2)) / valid)


def trans_mvsnet_loss(outputs: Dict, depth_gt_ms: Dict, mask_ms: Dict,
                      dlossw=None):
    """Per-stage entropy loss (×2) weighted by dlossw; returns
    (total_loss, last_stage_depth_loss, total_entropy, last_depth_entropy).
    """
    total_loss = 0.0
    total_entropy = 0.0
    depth_loss = 0.0
    depth_entropy = None
    for key in sorted(k for k in outputs if k.startswith("stage")):
        stage = outputs[key]
        mask = mask_ms[key] > 0.5
        entro, depth_entropy = entropy_loss(
            stage["prob_volume"], depth_gt_ms[key], mask,
            stage["depth_values"])
        entro = entro * 2.0
        depth_loss = _masked_mean(
            smooth_l1(depth_entropy, depth_gt_ms[key]),
            mask.astype(depth_entropy.dtype))
        total_entropy = total_entropy + entro
        if dlossw is not None:
            idx = int(key.replace("stage", "")) - 1
            total_loss = total_loss + dlossw[idx] * entro
        else:
            total_loss = total_loss + entro
    return total_loss, depth_loss, total_entropy, depth_entropy


def focal_loss_bld(outputs: Dict, depth_gt_ms: Dict, mask_ms: Dict,
                   depth_interval, dlossw=None):
    """BlendedMVS variant: entropy losses + scaled-EPE metrics."""
    total_loss, depth_loss, total_entropy, _ = trans_mvsnet_loss(
        outputs, depth_gt_ms, mask_ms, dlossw)
    last = f"stage{len([k for k in outputs if k.startswith('stage')])}"
    abs_err = jnp.abs(depth_gt_ms[last] - outputs[last]["depth"])
    abs_err_scaled = abs_err / (depth_interval * 192.0 / 128.0)
    maskf = (mask_ms[last] > 0.5).astype(abs_err.dtype)
    epe = _masked_mean(abs_err_scaled, maskf)
    less1 = _masked_mean((abs_err_scaled < 1.0).astype(abs_err.dtype), maskf)
    less3 = _masked_mean((abs_err_scaled < 3.0).astype(abs_err.dtype), maskf)
    return total_loss, depth_loss, epe, less1, less3


def abs_depth_error(pred, gt, mask, thresh=None):
    """AbsDepthError_metrics (deps/TransMVSNet/utils.py:268-275)."""
    err = jnp.abs(pred - gt)
    maskf = mask.astype(pred.dtype)
    if thresh is not None:
        maskf = maskf * (err < thresh)
    return _masked_mean(err, maskf)


def threshold_metric(pred, gt, mask, thresh):
    """Thres_metrics: fraction of valid pixels with error > thresh px."""
    err = jnp.abs(pred - gt)
    return _masked_mean((err > thresh).astype(pred.dtype),
                        mask.astype(pred.dtype))
