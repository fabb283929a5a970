"""Dense face-keypoint regressor (NOVEL auxiliary).

Parity target: reference ``src/models/novel/dense_regressor.py`` — a CNN
backbone (EfficientNet-B0 / ResNet18 / ConvNeXt in the reference) regressing
``num_point × dim_output`` dense keypoints with an L1 loss. Here the
backbone is the framework's ResNet (18/34) with global average pooling + a
dense head; kept swappable via ``backbone``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from diner_tpu.nn.resnet import ResNetEncoder


@dataclass(frozen=True)
class DenseRegressorConfig:
    backbone: str = "resnet18"
    num_point: int = 26317
    dim_output: int = 2
    lr: float = 1e-4


class DenseRegressor(nn.Module):
    cfg: DenseRegressorConfig = DenseRegressorConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = True):
        """images (B, H, W, 3) → (B, num_point, dim_output)."""
        latents = ResNetEncoder(backbone=self.cfg.backbone, num_layers=5,
                                dtype=self.dtype, name="backbone")(
            images, train=train)
        h = jnp.mean(latents[-1], axis=(1, 2))  # global average pool
        out = nn.Dense(self.cfg.num_point * self.cfg.dim_output,
                       dtype=self.dtype, name="head")(h)
        return out.reshape(out.shape[0], self.cfg.num_point,
                           self.cfg.dim_output)


def create_regressor_state(cfg: DenseRegressorConfig, rng, example_images):
    model = DenseRegressor(cfg=cfg)
    variables = model.init(rng, example_images, train=False)
    tx = optax.adam(cfg.lr)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    return model, state, tx


def make_regressor_train_step(model: DenseRegressor, tx):
    def step(state, batch):
        """batch: {"image" (B, H, W, 3), "target_keypoints" (B, P, D)}."""

        def loss_fn(params):
            pred, mutated = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                batch["image"], train=True, mutable=["batch_stats"])
            loss = jnp.mean(jnp.abs(batch["target_keypoints"] - pred))
            return loss, mutated["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "batch_stats": stats,
                 "opt_state": opt_state, "step": state["step"] + 1},
                {"total": loss})

    return step
