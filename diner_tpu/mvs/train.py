"""TransMVSNet training / prediction drivers.

Parity target: reference ``deps/TransMVSNet/train.py`` — Adam +
WarmupMultiStepLR, NCCL DDP → here a data-parallel device mesh, NaN guard
(skip-step instead of the reference's NanError catch-and-continue),
checkpoint save/resume, and the ``write_prediction`` mode that runs
inference over a dataset and writes the uint16 depth/confidence PNGs DINER
consumes (train.py:152-208), un-scaling DTU depth by 872/0.7.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diner_tpu.mvs.loss import trans_mvsnet_loss
from diner_tpu.mvs.model import TransMVSNet, TransMVSNetConfig


@dataclass(frozen=True)
class MVSTrainConfig:
    model: TransMVSNetConfig = TransMVSNetConfig()
    lr: float = 1e-3
    weight_decay: float = 0.0
    # WarmupMultiStepLR (deps/TransMVSNet/utils.py:323): linear warmup then
    # step decay at epoch milestones
    warmup_steps: int = 500
    warmup_factor: float = 1.0 / 3
    milestones: Tuple[int, ...] = (10000, 12000, 14000)
    gamma: float = 0.5
    dlossw: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # activation/matmul dtype ("float32" | "bfloat16"); params stay f32
    compute_dtype: str = "float32"


def warmup_multistep_schedule(cfg: MVSTrainConfig):
    def schedule(step):
        warm = jnp.minimum(step / jnp.maximum(cfg.warmup_steps, 1), 1.0)
        factor = cfg.warmup_factor + (1 - cfg.warmup_factor) * warm
        decay = jnp.asarray(1.0)
        for m in cfg.milestones:
            decay = decay * jnp.where(step >= m, cfg.gamma, 1.0)
        return cfg.lr * factor * decay
    return schedule


def create_mvs_state(cfg: MVSTrainConfig, rng, example_batch):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = TransMVSNet(cfg=cfg.model, dtype=dtype)
    variables = model.init(rng, example_batch["imgs"],
                           example_batch["proj_matrices"],
                           example_batch["depth_values"], train=False)
    tx = optax.adam(warmup_multistep_schedule(cfg))
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    return model, state, tx


def make_mvs_train_step(model: TransMVSNet, cfg: MVSTrainConfig, tx):
    def train_step(state, batch):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                batch["imgs"], batch["proj_matrices"],
                batch["depth_values"], train=True,
                mutable=["batch_stats"])
            total, depth_loss, entropy, _ = trans_mvsnet_loss(
                out, batch["depth"], batch["mask"], dlossw=cfg.dlossw)
            return total, (depth_loss, entropy, mutated["batch_stats"])

        (total, (depth_loss, entropy, stats)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state["params"])

        # NaN guard: skip the update on non-finite loss (the reference
        # catches NanError and continues, train.py:241-244)
        finite = jnp.isfinite(total)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "batch_stats": stats,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        metrics = {"loss": total, "depth_loss": depth_loss,
                   "entropy": entropy, "skipped": 1.0 - finite}
        return new_state, metrics

    return train_step


DTU_DEPTH_UNSCALE = 872.0 / 0.7


def write_prediction(model: TransMVSNet, variables, dataset, outpath,
                     depth_scale: float = DTU_DEPTH_UNSCALE,
                     mask_output: bool = False,
                     out_suffix: str = "TransMVSNet",
                     facescape_triptych: bool = False,
                     batch_eval_fn=None):
    """Run inference and write uint16 depth/conf/vis PNGs next to the GT
    protocol (reference train.py:152-208).

    Writes ``<stem>_{out_suffix}.png`` (depth / scale), ``..._conf.png`` and
    ``..._vis.png`` under ``outpath`` mirroring the dataset's dpath tree.
    """
    from diner_tpu.data.io import write_depth_png
    from diner_tpu.utils.visual import colorize, save_image

    if batch_eval_fn is None:
        @jax.jit
        def batch_eval_fn(imgs, projs, depth_values):
            return model.apply(variables, imgs, projs, depth_values,
                               train=False)

    outpath = Path(outpath)
    written = []
    for i in range(len(dataset)):
        s = dataset[i]
        out = batch_eval_fn(
            jnp.asarray(s["imgs"])[None],
            {k: jnp.asarray(v)[None] for k, v in s["proj_matrices"].items()},
            jnp.asarray(s["depth_values"])[None])
        depth = np.asarray(out["depth"])[0] / depth_scale
        conf = np.asarray(out["photometric_confidence"])[0]
        if mask_output and s.get("mask") is not None:
            m = s["mask"]["stage3"] > 0.5
            depth = depth * m
            conf = conf * m
        stem = ".".join(s["dpath"].split(".")[:-1])
        dst = outpath / (stem + f"_{out_suffix}.png")
        os.makedirs(dst.parent, exist_ok=True)
        if facescape_triptych:
            # facescape protocol (train.py:183-202): paste confidence next
            # to the existing [gt | pred] image -> *_gt_pred_conf.png
            from PIL import Image
            gt_path = outpath / (stem + f"_{out_suffix}.png")
            if gt_path.exists():
                gt_img = Image.open(gt_path)
                conf_q = np.clip(conf / 1e-4, 0, 65535).astype(np.uint16)
                conf_img = Image.fromarray(conf_q)
                trip = Image.new("I", (gt_img.width + conf_img.width,
                                       conf_img.height))
                trip.paste(gt_img, (0, 0))
                trip.paste(conf_img, (gt_img.width, 0))
                trip.save(outpath / (stem + "_gt_pred_conf.png"))
                os.remove(gt_path)
                written.append(str(outpath / (stem + "_gt_pred_conf.png")))
                continue
        write_depth_png(dst, depth)
        write_depth_png(outpath / (stem + f"_{out_suffix}_conf.png"), conf)
        nz = depth[depth != 0]
        save_image(outpath / (stem + f"_{out_suffix}_vis.png"),
                   colorize(depth, vmin=float(nz.min()) if nz.size else None))
        written.append(str(dst))
    return written
