#!/usr/bin/env python
"""KeypointNeRF rendering roofline + attack record (VERDICT r4 item 3).

Round-4 measured 68.5 s warm per 256² image = 957 rays/s with no
attribution. This probe times every stage of the tiled pixel-shuffle
renderer (reference ``src/models/keypointnerf.py:951-1202``) at the 256²
protocol (2 src views, dr_level=5 → stride 16 → 256 tiles of 256 rays,
64 coarse + 128-fine samples):

  - encode_features (hourglass geo + ResBlk tex encoders) — once per image
  - render_rays for one 16-tile group (4096 rays) — the fused
    query (PE + fusion MLP + IBR head) + compositing path
  - the OLD per-tile loop's cost model: the r4 code re-ran encode_features
    inside EVERY tile call and paid 256 relay dispatches — timed here from
    a re-created per-tile closure (a few tiles, extrapolated ×256)
  - the NEW render_full_image (encode hoisted, 16 tiles/call) — full wall

Writes KEYPOINTNERF_ROOFLINE_r05.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from diner_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    respect_env_platform,
)
respect_env_platform()
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from scripts.smoke_variants import YAML  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="256,256")
    ap.add_argument("--old-tiles", type=int, default=6,
                    help="tiles to time for the old-path extrapolation")
    ap.add_argument("--out", default="KEYPOINTNERF_ROOFLINE_r05.json")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split(","))

    from diner_tpu.data.loader import DataLoader
    from diner_tpu.train.config import load_train_config
    from diner_tpu.models.keypointnerf.train import (
        build_keypointnerf_run_config, create_keypointnerf_state,
        decode_cameras, render_full_image, target_rays)

    work = Path("outputs/kpn_roofline")
    work.mkdir(parents=True, exist_ok=True)
    cfg_path = work / "KeypointNeRF.yaml"
    cfg_path.write_text(YAML.format(work=work, model="KeypointNeRF",
                                    H=H, W=W, dtype="float32"))
    run_cfg = load_train_config(cfg_path, model_name="KeypointNeRF")
    run_cfg.model_name = "KeypointNeRF"
    train_set = run_cfg.build_dataset("train")
    batch = {k: jnp.asarray(v) for k, v in next(iter(DataLoader(
        train_set, batch_size=1, num_workers=0))).items()
        if isinstance(v, np.ndarray)}

    cfg = build_keypointnerf_run_config(run_cfg)
    model, state, tx = create_keypointnerf_state(
        cfg, jax.random.PRNGKey(0), batch, None)
    params = state["params"]
    mcfg = cfg.model
    b = batch
    B, V, _, _, _ = b["src_rgbs"].shape
    imgs = b["src_rgbs"].reshape(B * V, H, W, 3)
    cams = decode_cameras(b, mcfg)
    stride = 2 ** (mcfg.dr_level - 1)
    out_h, out_w = H // stride, W // stride
    n_tiles = stride * stride
    out = {"backend": jax.default_backend(), "hw": [H, W],
           "stride": stride, "n_tiles": n_tiles,
           "rays_per_tile": out_h * out_w,
           "samples_per_ray": [mcfg.sample_per_ray_c,
                               mcfg.sample_per_ray_f]}

    def timed(fn, *a, reps=3):
        r = fn(*a)
        jax.tree_util.tree_map(np.asarray, r)  # warm + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*a)
            jax.tree_util.tree_map(np.asarray, r)
            ts.append(time.perf_counter() - t0)
        return min(ts), r

    # ---- stage: encoders (geo hourglass + tex ResBlk), once per image
    enc = jax.jit(lambda p, im: model.apply({"params": p}, im,
                                            method="encode_features"))
    t_enc, (feat_geo, feat_tex) = timed(enc, params, imgs)
    out["encode_s"] = round(t_enc, 3)

    # ---- stage: one 16-tile group render (query MLP+IBR + composite)
    gy, gx = jnp.meshgrid(jnp.arange(0, H, stride),
                          jnp.arange(0, W, stride), indexing="ij")
    base = jnp.stack([gx, gy], -1).reshape(1, -1, 2).astype(jnp.float32)
    group = 16
    grids16 = jnp.concatenate(
        [base + jnp.asarray([[j, i]], jnp.float32)
         for i, j in [(k // stride, k % stride) for k in range(group)]],
        axis=1)

    def run_render(fg, ft, grids, k):
        orig, dirs, zn, zf = target_rays(cams["cam_tar"], grids,
                                         mcfg.znear, mcfg.zfar, b["bounds"])
        return model.apply(
            {"params": params},
            jnp.broadcast_to(orig, dirs.shape), dirs, zn, zf, cams["cam"],
            fg, ft, imgs, b["target_kpt3d"],
            b["src_alphas"].reshape(B * V, H, W, 1), k, False,
            method="render_rays")["color_fine"]

    rend = jax.jit(run_render)
    t_g16, _ = timed(rend, feat_geo, feat_tex, grids16,
                     jax.random.PRNGKey(1))
    out["render_16tile_group_s"] = round(t_g16, 3)
    out["render_group_rays_per_s"] = round(group * out_h * out_w / t_g16)

    # ---- the OLD path's per-tile closure (encode INSIDE, 1 tile/call)
    def run_old(grids, k):
        fg, ft = model.apply({"params": params}, imgs,
                             method="encode_features")
        return run_render(fg, ft, grids, k)

    old = jax.jit(run_old)
    t_old_tile, _ = timed(old, base, jax.random.PRNGKey(1),
                          reps=args.old_tiles)
    out["old_per_tile_s"] = round(t_old_tile, 3)
    out["old_full_image_extrapolated_s"] = round(t_old_tile * n_tiles, 1)

    # ---- the NEW full-image wall (encode hoisted, 16 tiles/call)
    t0 = time.perf_counter()
    color, depth = render_full_image(model, mcfg, params, batch,
                                     jax.random.PRNGKey(2))
    out["new_full_image_incl_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    color, depth = render_full_image(model, mcfg, params, batch,
                                     jax.random.PRNGKey(3))
    t_new = time.perf_counter() - t0
    out["new_full_image_warm_s"] = round(t_new, 2)
    out["new_rays_per_s"] = round(H * W / t_new)
    out["r4_baseline"] = {"warm_render_s": 68.51, "rays_per_s": 957,
                          "cause": "encode_features re-ran inside every "
                                   "one of the 256 tile calls + 256 relay "
                                   "dispatches (~35 ms floor each)"}
    assert np.isfinite(color).all()

    (REPO / args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
