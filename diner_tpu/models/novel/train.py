"""NOVEL training step.

Parity target: reference ``src/models/novel/novel.py`` — the DINER training
recipe (pixel/patch ray selection, MSE + VGG + antibias) with the NOVEL
renderer: encode source views + the canonical "gen" camera, render with
target-mesh deformation offsets, optimize field + gen-latent-plane
parameters jointly.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import flax.struct
import jax
import jax.numpy as jnp
import optax

from diner_tpu.geometry import gen_rays
from diner_tpu.losses import antibias_loss, mse_loss, vgg_loss
from diner_tpu.models.novel.model import (
    NovelPixelNeRF,
    NovelPixelNeRFConfig,
    make_gen_context,
)
from diner_tpu.models.novel.renderer import render_rays_novel
from diner_tpu.train.diner import DinerConfig, select_pixels


@dataclass(frozen=True)
class NovelConfig(DinerConfig):
    nerf: NovelPixelNeRFConfig = dc_field(
        default_factory=NovelPixelNeRFConfig)


@flax.struct.dataclass
class NovelState:
    params: any
    batch_stats: any
    opt_state: any
    vgg_params: any
    step: jax.Array


def create_novel_state(cfg: NovelConfig, rng, example_batch,
                       vgg_params=None):
    model = NovelPixelNeRF(cfg=cfg.nerf)
    b = example_batch
    H, W = b["target_rgb"].shape[1:3]
    gen = make_gen_context(
        b["gen_extrinsics"], b["gen_intrinsics"], (W, H),
        src_pe_maps=b.get("src_pos_encodings"),
        tgt_pe_map=(b["target_pos_encoding"][:, None]
                    if "target_pos_encoding" in b else None))
    variables = model.init(
        rng, b["src_rgbs"], b["src_depths"], b["src_depth_stds"],
        b["src_extrinsics"], b["src_intrinsics"], gen,
        jnp.zeros((b["src_rgbs"].shape[0], 8, 3)),
        jnp.zeros((b["src_rgbs"].shape[0], 8, 3)),
        jnp.zeros((b["src_rgbs"].shape[0], 8, 3)))
    tx = optax.adam(cfg.lr)
    state = NovelState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        vgg_params=vgg_params,
        step=jnp.zeros((), jnp.int32))
    return model, state


def compute_novel_losses(model: NovelPixelNeRF, cfg: NovelConfig, params,
                         batch_stats, vgg_params, batch, key):
    b = batch
    SB, H, W, _ = b["target_rgb"].shape
    k_pix, k_render = jax.random.split(key)
    variables = {"params": params, "batch_stats": batch_stats}

    ctx, mutated = model.apply(
        variables, b["src_rgbs"], b["src_depths"], b["src_depth_stds"],
        b["src_extrinsics"], b["src_intrinsics"], train=True,
        method="encode", mutable=["batch_stats"])
    gen = make_gen_context(b["gen_extrinsics"], b["gen_intrinsics"], (W, H),
                           src_pe_maps=b.get("src_pos_encodings"),
                           tgt_pe_map=(b["target_pos_encoding"][:, None]
                                       if "target_pos_encoding" in b and
                                       model.cfg.use_pe_maps else None))

    znear = jnp.full((SB,), cfg.znear)
    zfar = jnp.full((SB,), cfg.zfar)
    rays = gen_rays(b["target_extrinsics"], b["target_intrinsics"], W, H,
                    znear, zfar).reshape(SB, H * W, 8)
    pix = select_pixels(cfg, b, k_pix)
    rays_sel = jnp.take_along_axis(rays, pix[..., None], axis=1)
    gt = jnp.take_along_axis(b["target_rgb"].reshape(SB, H * W, 3),
                             pix[..., None], axis=1)

    def field_fn(c, g, xyz, gxyz, vd):
        return model.apply(variables, c, g, xyz, gxyz, vd, method="field")

    out = render_rays_novel(
        field_fn, ctx, gen, rays_sel, b["target_vertices"],
        b["offset_target_to_source"], b["offset_target_to_gen"],
        k_render, cfg.renderer)

    loss_rgb = mse_loss(out.rgb, gt)
    total = loss_rgb
    metrics = {"rgb_fine": loss_rgb}
    if cfg.w_vgg > 0:
        s = cfg.vgg_spatch
        pred = out.rgb.reshape(SB, s, s, 3)
        gti = gt.reshape(SB, s, s, 3)
        lv = vgg_loss(jax.lax.stop_gradient(vgg_params), pred, gti)
        total = total + cfg.w_vgg * lv
        metrics["vgg_fine"] = lv
        if cfg.w_antibias > 0:
            la = antibias_loss(pred, gti, cfg.antibias_downsampling)
            total = total + cfg.w_antibias * la
            metrics["antibias"] = la
    metrics["total"] = total
    return total, {"metrics": metrics,
                   "batch_stats": mutated["batch_stats"]}


def make_novel_train_step(model: NovelPixelNeRF, cfg: NovelConfig):
    tx = optax.adam(cfg.lr)

    def step(state: NovelState, batch, key):
        def loss_fn(p):
            return compute_novel_losses(model, cfg, p, state.batch_stats,
                                        state.vgg_params, batch, key)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, opt_state=opt_state,
                              batch_stats=aux["batch_stats"],
                              step=state.step + 1),
                aux["metrics"])

    return step


def build_novel_run_config(run_cfg, use_pe: bool = False) -> NovelConfig:
    """YAML run config → NovelConfig (shared by fit_novel and the
    hardware smoke / eval drivers)."""
    from diner_tpu.train.config import (
        build_pixelnerf_config,
        build_renderer_config,
    )

    raw = run_cfg.raw
    base = build_pixelnerf_config(raw["nerf"])
    nerf = NovelPixelNeRFConfig(
        **{k: getattr(base, k) for k in
           ("num_freqs", "freq_factor", "include_input", "encoder",
            "n_blocks", "d_hidden", "combine_layer", "mlp_beta",
            "compute_dtype")},
        use_pe_maps=use_pe)
    d = run_cfg.diner
    return NovelConfig(
        nerf=nerf, renderer=build_renderer_config(raw["renderer"]),
        znear=d.znear, zfar=d.zfar, ray_batch_size=d.ray_batch_size,
        lr=d.lr, w_vgg=d.w_vgg, vgg_spatch=d.vgg_spatch,
        w_antibias=d.w_antibias,
        antibias_downsampling=d.antibias_downsampling)


def fit_novel(run_cfg, max_steps=None, use_pe: bool = False):
    """Driver entry for scripts/train.py NOVEL / NOVEL_PE branches."""
    import numpy as np

    from diner_tpu.data.loader import DataLoader
    from diner_tpu.losses import init_vgg19_params
    from diner_tpu.train import checkpoint as ckpt_lib

    cfg = build_novel_run_config(run_cfg, use_pe)
    train_set = run_cfg.build_dataset("train")
    loader = DataLoader(train_set, **{"batch_size": 1, "shuffle": True,
                                      **run_cfg.dataloader_kwargs("train")})

    def to_dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}

    example = to_dev(next(iter(DataLoader(train_set, 1, num_workers=0))))
    vggp = init_vgg19_params() if cfg.w_vgg > 0 else None
    model, state = create_novel_state(cfg, jax.random.PRNGKey(0), example,
                                      vggp)
    step_fn = jax.jit(make_novel_train_step(model, cfg))

    key = jax.random.PRNGKey(1)
    step = 0
    while True:
        for batch in loader:
            if max_steps is not None and step >= max_steps:
                ckpt_lib.save_checkpoint(run_cfg.run_dir / "checkpoints",
                                         state)
                return state
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, to_dev(batch), sub)
            step = int(state.step)
            if step % 50 == 0:
                print(f"step {step} total {float(metrics['total']):.4f}")
