#!/usr/bin/env python
"""Hardware smokes for the three variant models (VERDICT r2 item 7).

For each of KeypointNeRF / NOVEL / NOVEL_PE:
  1. train a few steps ON THE CURRENT BACKEND through the proven
     `scripts/train.py` CLI (synthetic sphere data with the variant's batch
     schema — kpt3d/bounds, vertices/offsets/gen camera, PE maps);
  2. reload the checkpoint and render one image / ray block, asserting
     finiteness and recording the times.

Writes VARIANT_SMOKES.json. Run on the TPU:
    python -u scripts/smoke_variants.py --steps 20 --hw 64,64
Match: reference `src/models/keypointnerf.py:365`, `novel/novel.py:20`,
`novel_pe/novel_pe.py:20` (the fork's three non-DINER LightningModules).
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

YAML = """\
logger:
  kwargs: {{save_dir: "{work}", version: "{model}"}}
data:
  train:
    dataset:
      module: synthetic_sphere
      kwargs: {{n: 16, H: {H}, W: {W}, nv: 2}}
    dataloader:
      kwargs: {{shuffle: true, batch_size: 1}}
  val:
    dataset:
      module: synthetic_sphere
      kwargs: {{n: 4, H: {H}, W: {W}, nv: 2}}
    dataloader:
      kwargs: {{shuffle: false, batch_size: 1}}
nerf:
  module: pixelnerf
  kwargs:
    encoder_conf:
      module: spatial
      kwargs: {{backbone: resnet34, image_padding: 16, padding_pe: 4}}
    poscode_conf:
      kwargs: {{num_freqs: 6, freq_factor: 6.28, include_input: true}}
    mlp_fine_conf:
      module: resnetfc
      kwargs: {{n_blocks: 5, d_hidden: 512, combine_layer: 3, combine_type: average}}
    compute_dtype: {dtype}
renderer:
  module: dgs
  kwargs: {{n_samples: 16, n_depth_candidates: 128, n_gaussian: 4, white_bkgd: True, ray_chunk: 4096}}
znear: 0.8
zfar: 2.4
optimizer:
  kwargs: {{ray_batch_size: 128, lr: 1e-4, w_vgg: 0.0, w_antibias: 0.0}}
keypoint_nerf:
  lambdas: {{lambda_vgg: 0.0}}
trainer:
  kwargs: {{max_epochs: -1}}
"""


def train(model, cfg_path, steps, log):
    t0 = time.perf_counter()
    with open(log, "ab") as f:
        p = subprocess.run(
            [sys.executable, "scripts/train.py", str(cfg_path), model,
             "--max-steps", str(steps)],
            cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    if p.returncode != 0:
        sys.stderr.write(Path(log).read_text()[-3000:])
        raise SystemExit(f"{model} training failed")
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--hw", default="64,64")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--work", default="outputs/variant_smokes")
    ap.add_argument("--models", nargs="+",
                    default=["KeypointNeRF", "NOVEL", "NOVEL_PE"])
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split(","))
    work = Path(args.work).resolve()
    work.mkdir(parents=True, exist_ok=True)

    from diner_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from diner_tpu.data.loader import DataLoader
    from diner_tpu.train import checkpoint as ckpt_lib
    from diner_tpu.train.config import load_train_config
    from diner_tpu.utils.visual import save_image

    results = {"backend": jax.default_backend(), "hw": [H, W],
               "steps": args.steps, "models": {}}

    for model_name in args.models:
        # KeypointNeRF's stacked-hourglass geometry encoder needs its
        # reference input size (256², facescape.py:45) — smaller inputs
        # collapse to zero-size pyramid levels
        mh, mw = (256, 256) if model_name == "KeypointNeRF" else (H, W)
        cfg_path = work / f"{model_name}.yaml"
        cfg_path.write_text(YAML.format(
            work=work, model=model_name, H=mh, W=mw,
            dtype=args.dtype if model_name != "KeypointNeRF" else "float32"))
        log = work / f"{model_name}.log"
        print(f"[smoke] {model_name}: training {args.steps} steps...",
              flush=True)
        train_s = train(model_name, cfg_path, args.steps, log)
        print(f"[smoke] {model_name}: trained in {train_s:.0f}s", flush=True)

        run_cfg = load_train_config(cfg_path, model_name=model_name)
        run_cfg.model_name = model_name
        ds = run_cfg.build_dataset("val")
        batch = {k: jnp.asarray(v) for k, v in
                 next(iter(DataLoader(ds, 1, num_workers=0))).items()
                 if isinstance(v, np.ndarray)}
        ckpt = ckpt_lib.latest_checkpoint(
            Path(run_cfg.run_dir) / "checkpoints")
        assert ckpt, f"no checkpoint for {model_name}"

        t0 = time.perf_counter()
        if model_name == "KeypointNeRF":
            from diner_tpu.models.keypointnerf.train import (
                build_keypointnerf_run_config, create_keypointnerf_state,
                render_full_image)
            cfg = build_keypointnerf_run_config(run_cfg)
            model, state, _ = create_keypointnerf_state(
                cfg, jax.random.PRNGKey(0), batch, None)
            state = ckpt_lib.restore_checkpoint(ckpt, state)
            color, depth = render_full_image(
                model.model if hasattr(model, "model") else model,
                cfg.model, state["params"], batch, jax.random.PRNGKey(2))
            assert np.isfinite(color).all() and np.isfinite(depth).all()
            save_image(work / f"{model_name}_render.png", color)
            rendered = list(color.shape)
        else:
            from diner_tpu.geometry import gen_rays
            from diner_tpu.models.novel.model import make_gen_context
            from diner_tpu.models.novel.renderer import render_rays_novel
            from diner_tpu.models.novel.train import (
                build_novel_run_config, create_novel_state)
            cfg = build_novel_run_config(
                run_cfg, use_pe=(model_name == "NOVEL_PE"))
            model, state = create_novel_state(cfg, jax.random.PRNGKey(0),
                                              batch, None)
            state = ckpt_lib.restore_checkpoint(ckpt, state)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            ctx, _ = model.apply(
                variables, batch["src_rgbs"], batch["src_depths"],
                batch["src_depth_stds"], batch["src_extrinsics"],
                batch["src_intrinsics"], train=True, method="encode",
                mutable=["batch_stats"])
            gen = make_gen_context(
                batch["gen_extrinsics"], batch["gen_intrinsics"], (W, H),
                src_pe_maps=batch.get("src_pos_encodings"),
                tgt_pe_map=(batch["target_pos_encoding"][:, None]
                            if "target_pos_encoding" in batch else None))
            znear = jnp.full((1,), cfg.znear)
            zfar = jnp.full((1,), cfg.zfar)
            rays = gen_rays(batch["target_extrinsics"],
                            batch["target_intrinsics"], W, H, znear,
                            zfar).reshape(1, H * W, 8)

            def field_fn(c, g, xyz, gxyz, vd):
                return model.apply(variables, c, g, xyz, gxyz, vd,
                                   method="field")

            out = render_rays_novel(
                field_fn, ctx, gen, rays, batch["target_vertices"],
                batch["offset_target_to_source"],
                batch["offset_target_to_gen"], jax.random.PRNGKey(2),
                cfg.renderer)
            rgb = np.asarray(out.rgb, np.float32).reshape(H, W, 3)
            assert np.isfinite(rgb).all()
            save_image(work / f"{model_name}_render.png",
                       np.clip(rgb, 0, 1))
            rendered = [H, W, 3]
        render_s = time.perf_counter() - t0

        results["models"][model_name] = {
            "train_s_total": round(train_s, 1),
            "s_per_step_incl_compile": round(train_s / args.steps, 2),
            "render_s_incl_compile": round(render_s, 1),
            "render_shape": rendered,
            "finite": True,
        }
        print(json.dumps({model_name: results["models"][model_name]}),
              flush=True)

    (REPO / "VARIANT_SMOKES.json").write_text(json.dumps(results, indent=2))
    print("wrote VARIANT_SMOKES.json", flush=True)


if __name__ == "__main__":
    main()
