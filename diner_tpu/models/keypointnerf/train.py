"""KeypointNeRF training / rendering orchestration.

Parity target: reference ``src/models/keypointnerf.py`` LightningModule —
``decode_batch`` camera packing (:278-363), the mask-centered 64×64 training
patch (:1062-1072), target-ray construction through inv(K)/RT with ray–bbox
near/far clipping (:1080-1100), losses (keypointnerf_util.compute_error),
and strided-tile full-image rendering recombined by pixel shuffle
(:952-996).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diner_tpu.losses import l1_loss, vgg_loss
from diner_tpu.models.keypointnerf.model import (
    KeypointNeRF,
    KeypointNeRFConfig,
    ray_bbox_intersection,
)


@dataclass(frozen=True)
class KeypointNeRFTrainConfig:
    model: KeypointNeRFConfig = dc_field(default_factory=KeypointNeRFConfig)
    lr: float = 1e-4
    lambda_l1_c: float = 1.0
    lambda_l1: float = 10.0
    lambda_vgg: float = 0.5


def decode_cameras(batch, cfg: KeypointNeRFConfig) -> Dict:
    """Pack per-view camera dicts (decode_batch, keypointnerf.py:278-341).

    batch uses the channels-last facescape keys (src_* / target_*)."""
    src_extr = batch["src_extrinsics"]  # (B, V, 4, 4)
    src_intr = batch["src_intrinsics"]  # (B, V, 3, 3)
    B, V = src_extr.shape[:2]
    H, W = batch["src_rgbs"].shape[2:4]

    K4 = jnp.tile(jnp.eye(4), (B * V, 1, 1))
    K4 = K4.at[:, :3, :3].set(src_intr.reshape(B * V, 3, 3))
    extrin = src_extr.reshape(B * V, 4, 4)
    cam = {
        "KRT": jnp.einsum("bij,bjk->bik", K4, extrin, precision="highest"),
        "K": K4,
        "extrin": extrin,
        "width": W,
        "height": H,
    }
    tK4 = jnp.tile(jnp.eye(4), (B, 1, 1))
    tK4 = tK4.at[:, :3, :3].set(batch["target_intrinsics"])
    cam_tar = {
        "K": tK4,
        "RT": batch["target_extrinsics"],
        "width": W,
        "height": H,
    }
    return {"cam": cam, "cam_tar": cam_tar}


def target_rays(cam_tar, grids, znear: float, zfar: float, bounds):
    """World rays through target pixels with bbox-clipped near/far
    (keypointnerf.py:1080-1100). grids: (B, R, 2) pixel coords."""
    B, R, _ = grids.shape
    ones = jnp.ones_like(grids[..., :1])
    grids_h = jnp.concatenate([grids, ones], axis=-1)
    inv_K = jnp.swapaxes(jnp.linalg.inv(cam_tar["K"][:, :3, :3]), -1, -2)
    cam_rays = jnp.einsum("brj,bjk->brk", grids_h, inv_K,
                          precision="highest")
    znear_r = jnp.linalg.norm(znear * cam_rays, axis=-1, keepdims=True)
    zfar_r = jnp.linalg.norm(zfar * cam_rays, axis=-1, keepdims=True)
    RT = cam_tar["RT"]
    dirs = jnp.einsum("brj,bjk->brk", cam_rays, RT[:, :3, :3],
                      precision="highest")
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    orig = -jnp.einsum("bj,bjk->bk", RT[:, :3, 3], RT[:, :3, :3],
                       precision="highest")[:, None]  # (B, 1, 3)

    z1, z2, hit = ray_bbox_intersection(bounds, orig, dirs)
    m1 = (hit & (z1 > znear_r)).astype(jnp.float32)
    znear_r = m1 * z1 + (1 - m1) * znear_r
    m2 = (hit & (z2 < zfar_r)).astype(jnp.float32)
    zfar_r = m2 * z2 + (1 - m2) * zfar_r
    return orig, dirs, znear_r, zfar_r


def training_patch_grid(mask, out_h: int, out_w: int, key):
    """Mask-centered training patch (keypointnerf.py:1062-1072) via
    Gumbel-max over mask pixels. mask: (B, H, W)."""
    B, H, W = mask.shape
    logits = jnp.where(mask.reshape(B, -1) > 0, 0.0, -jnp.inf)
    center = jax.random.categorical(key, logits, axis=-1)
    cx = (center % W)[:, None]
    cy = (center // W)[:, None]
    gy, gx = jnp.meshgrid(jnp.arange(out_h), jnp.arange(out_w),
                          indexing="ij")
    grid = jnp.stack([gx, gy], -1).reshape(-1, 2)[None]
    grid = grid + jnp.stack([cx, cy], -1) - out_h // 2
    grid = jnp.clip(grid, 0, min(W - 1, H - 1))
    return grid.astype(jnp.float32)  # (B, out_h*out_w, 2)


def create_keypointnerf_state(cfg: KeypointNeRFTrainConfig, rng,
                              example_batch, vgg_params=None):
    model = KeypointNeRF(cfg=cfg.model)
    b = example_batch
    B, V, H, W, _ = b["src_rgbs"].shape
    cams = decode_cameras(b, cfg.model)

    def init_fn(rngs):
        def run(mdl):
            feat_geo, feat_tex = mdl.encode_features(
                b["src_rgbs"].reshape(B * V, H, W, 3))
            grids = jnp.zeros((B, 16, 2))
            orig, dirs, zn, zf = target_rays(
                cams["cam_tar"], grids, cfg.model.znear, cfg.model.zfar,
                b["bounds"])
            return mdl.render_rays(
                jnp.broadcast_to(orig, dirs.shape), dirs, zn, zf,
                cams["cam"], feat_geo, feat_tex,
                b["src_rgbs"].reshape(B * V, H, W, 3), b["target_kpt3d"],
                b["src_alphas"].reshape(B * V, H, W, 1),
                jax.random.PRNGKey(0), train=False)
        import flax.linen as nn
        return nn.init(run, model)(rngs)

    variables = init_fn(rng)
    tx = optax.adam(cfg.lr)
    state = {
        "params": variables["params"],
        "opt_state": tx.init(variables["params"]),
        "vgg_params": vgg_params,
        "step": jnp.zeros((), jnp.int32),
    }
    return model, state, tx


def compute_losses(model: KeypointNeRF, cfg: KeypointNeRFTrainConfig,
                   params, vgg_params, batch, key):
    """Patch render + L1(coarse) + L1/VGG(fine) (compute_error_nerf)."""
    mcfg = cfg.model
    b = batch
    B, V, H, W, _ = b["src_rgbs"].shape
    imgs = b["src_rgbs"].reshape(B * V, H, W, 3)
    cams = decode_cameras(b, mcfg)
    k_patch, k_render = jax.random.split(key)

    grids = training_patch_grid(b["target_mask"], mcfg.train_out_h,
                                mcfg.train_out_w, k_patch)
    orig, dirs, zn, zf = target_rays(cams["cam_tar"], grids, mcfg.znear,
                                     mcfg.zfar, b["bounds"])

    def run(mdl):
        feat_geo, feat_tex = mdl.encode_features(imgs)
        return mdl.render_rays(
            jnp.broadcast_to(orig, dirs.shape), dirs, zn, zf, cams["cam"],
            feat_geo, feat_tex, imgs, b["target_kpt3d"],
            b["src_alphas"].reshape(B * V, H, W, 1), k_render, train=True)

    import flax.linen as nn
    out = nn.apply(run, model)({"params": params})

    # gather target pixels at the patch grid
    idx = (grids[..., 0] + grids[..., 1] * W).astype(jnp.int32)
    tar = jnp.take_along_axis(
        b["target_rgb"].reshape(B, H * W, 3), idx[..., None], axis=1)
    tar = jax.lax.stop_gradient(tar)

    s = mcfg.train_out_h
    losses = {}
    total = cfg.lambda_l1_c * l1_loss(out["color"], tar)
    losses["e_pix_c"] = total
    if "color_fine" in out:
        lf = cfg.lambda_l1 * l1_loss(out["color_fine"], tar)
        losses["e_pix_l1"] = lf
        total = total + lf
        if vgg_params is not None and cfg.lambda_vgg > 0:
            lv = cfg.lambda_vgg * vgg_loss(
                jax.lax.stop_gradient(vgg_params),
                out["color_fine"].reshape(B, s, s, 3),
                tar.reshape(B, s, s, 3))
            losses["e_vgg"] = lv
            total = total + lv
    losses["e_all"] = total
    return total, losses


def make_keypointnerf_train_step(model, cfg: KeypointNeRFTrainConfig, tx):
    def step(state, batch, key):
        def loss_fn(p):
            return compute_losses(model, cfg, p, state["vgg_params"],
                                  batch, key)

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state,
                 "vgg_params": state["vgg_params"],
                 "step": state["step"] + 1}, losses)

    return step


def render_full_image(model, cfg: KeypointNeRFConfig, params, batch, key,
                      level: Optional[int] = None,
                      tiles_per_call: int = 16):
    """Strided-tile rendering recombined by pixel shuffle
    (render_pifu_nerf, keypointnerf.py:952-996).

    Unlike the reference's per-tile loop, the encoders run ONCE for the
    whole image (they depend only on the source views, not the tile) and
    ``tiles_per_call`` strided tiles are rendered per jitted call —
    KEYPOINTNERF_ROOFLINE_r05: the per-tile re-encode + per-call dispatch
    were ~95% of the original 68.5 s/image wall. Rays are independent, so
    grouping tiles changes nothing numerically (eval consumes no per-ray
    randomness: noise/dropout are train-only, fine resampling is the
    uniform midpoint rule)."""
    level = level if level is not None else cfg.dr_level
    stride = 2 ** (level - 1)
    b = batch
    B, V, H, W, _ = b["src_rgbs"].shape
    assert B == 1, "full-image rendering is per-sample"
    imgs = b["src_rgbs"].reshape(B * V, H, W, 3)
    cams = decode_cameras(b, cfg)

    feat_geo, feat_tex = jax.jit(
        lambda p, im: model.apply({"params": p}, im,
                                  method="encode_features"))(params, imgs)

    def run_render(fg, ft, grids, k):
        orig, dirs, zn, zf = target_rays(cams["cam_tar"], grids, cfg.znear,
                                         cfg.zfar, b["bounds"])
        return model.apply(
            {"params": params},
            jnp.broadcast_to(orig, dirs.shape), dirs, zn, zf, cams["cam"],
            fg, ft, imgs, b["target_kpt3d"],
            b["src_alphas"].reshape(B * V, H, W, 1), k, False,
            method="render_rays")

    apply = jax.jit(run_render)
    out_h, out_w = H // stride, W // stride
    gy, gx = jnp.meshgrid(jnp.arange(0, H, stride), jnp.arange(0, W, stride),
                          indexing="ij")
    base = jnp.stack([gx, gy], -1).reshape(1, -1, 2).astype(jnp.float32)
    n_rays = out_h * out_w

    offsets = [(i, j) for i in range(stride) for j in range(stride)]
    group = max(1, min(tiles_per_call, len(offsets)))
    while len(offsets) % group:  # keep one static grid shape (one compile)
        group -= 1

    color = np.zeros((H, W, 3), np.float32)
    depth = np.zeros((H, W), np.float32)
    for g0 in range(0, len(offsets), group):
        chunk_offsets = offsets[g0:g0 + group]
        grids = jnp.concatenate(
            [base + jnp.asarray([[j, i]], jnp.float32)
             for i, j in chunk_offsets], axis=1)  # (1, group*n_rays, 2)
        key, sub = jax.random.split(key)
        out = apply(feat_geo, feat_tex, grids, sub)
        c = np.asarray(out.get("color_fine", out["color"])
                       ).reshape(group, out_h, out_w, 3)
        d = np.asarray(out.get("depth_fine", out["depth"])
                       ).reshape(group, out_h, out_w)
        for t, (i, j) in enumerate(chunk_offsets):
            color[i::stride, j::stride] = c[t]
            depth[i::stride, j::stride] = d[t]
    return np.clip(color, 0, 1), depth


def build_keypointnerf_run_config(run_cfg) -> "KeypointNeRFTrainConfig":
    """YAML run config → KeypointNeRFTrainConfig (shared by
    fit_keypointnerf and the hardware smoke / eval drivers)."""
    raw = run_cfg.raw
    kn = raw.get("keypoint_nerf", {})
    lambdas = kn.get("lambdas", {})
    return KeypointNeRFTrainConfig(
        model=KeypointNeRFConfig(
            znear=run_cfg.diner.znear, zfar=run_cfg.diner.zfar,
            **kn.get("kwargs", {})),
        lr=float(raw.get("optimizer_keypointnerf", {})
                 .get("kwargs", {}).get("lr", 1e-4)),
        lambda_l1_c=lambdas.get("lambda_l1_c", 1.0),
        lambda_l1=lambdas.get("lambda_l1", 10.0),
        lambda_vgg=lambdas.get("lambda_vgg", 0.5),
    )


def fit_keypointnerf(run_cfg, max_steps: Optional[int] = None):
    """Driver entry for scripts/train.py KeypointNeRF branch."""
    from diner_tpu.data.loader import DataLoader
    from diner_tpu.losses import init_vgg19_params
    from diner_tpu.train import checkpoint as ckpt_lib

    cfg = build_keypointnerf_run_config(run_cfg)
    train_set = run_cfg.build_dataset("train")
    loader = DataLoader(train_set, **{"batch_size": 1, "shuffle": True,
                                      **run_cfg.dataloader_kwargs("train")})

    def to_dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}

    example = to_dev(next(iter(DataLoader(train_set, 1, num_workers=0))))
    vggp = init_vgg19_params() if cfg.lambda_vgg > 0 else None
    model, state, tx = create_keypointnerf_state(
        cfg, jax.random.PRNGKey(0), example, vggp)
    step_fn = jax.jit(make_keypointnerf_train_step(model, cfg, tx))

    key = jax.random.PRNGKey(1)
    step = 0
    while True:
        for batch in loader:
            if max_steps is not None and step >= max_steps:
                ckpt_lib.save_checkpoint(
                    run_cfg.run_dir / "checkpoints", state, step=step)
                return state
            key, sub = jax.random.split(key)
            state, losses = step_fn(state, to_dev(batch), sub)
            step = int(state["step"])
            if step % 50 == 0:
                print(f"step {step} e_all {float(losses['e_all']):.4f}")


def get_360_cameras(headpose: np.ndarray, focal: float, trans: float,
                    sc_factor: float, im_w: int, im_h: int,
                    n_frames: int = 90):
    """360-degree orbit cameras around a head pose
    (keypointnerf_util.py:23-73). Returns a list of dicts with w2cs / c2ws /
    intrinsics per frame."""
    from scipy.spatial.transform import Rotation

    T_i = np.eye(4, dtype=np.float32)
    T_i[:3, :3] = headpose[:3, :3].T
    T_i[:3, 3] = -headpose[:3, :3].T @ headpose[:3, 3]

    K4 = np.eye(4, dtype=np.float32)
    K4[:3, :3] = np.array([[focal, 0, im_w / 2], [0, focal, im_h / 2],
                           [0, 0, 1]], np.float32)
    dR1 = Rotation.from_rotvec([np.pi, 0, 0]).as_matrix()

    cams = []
    for idx in range(n_frames):
        theta = 2.0 * np.pi * idx / n_frames
        dR2 = Rotation.from_rotvec([0, theta, 0]).as_matrix()
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = (dR1 @ dR2).astype(np.float32)
        E[:3, 3] = [0, 0, trans]
        extr = (E @ T_i).astype(np.float32)
        extr[:3, 3] *= sc_factor
        cams.append({
            "w2cs": extr,
            "c2ws": np.linalg.inv(extr).astype(np.float32),
            "intrinsics": K4,
            "im_w": im_w, "im_h": im_h,
        })
    return cams
