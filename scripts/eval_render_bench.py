#!/usr/bin/env python
"""Full-image eval render bench: pair-table A/B + ray_chunk sweep.

VERDICT r3 items 2 & 7. Renders the DTU eval workload (512x640 target,
4 src 512x640 views, 64 depth-guided samples of 1000 candidates — the
``evaluate_diner_on_dtu.yaml`` protocol, reference
``src/models/diner.py:85`` / ``configs/evaluate_diner_on_dtu.yaml``) with
the flagship model, measuring warm seconds/image:

  - ray_chunk in {4096, 8192, 16384}
  - wide-row pair-table latent lookup ON vs OFF

Writes EVAL_RENDER_r04.json. Run:  python -u scripts/eval_render_bench.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from diner_tpu.geometry.rays import gen_rays
from diner_tpu.models.pixelnerf import PixelNeRF, PixelNeRFConfig
from diner_tpu.renderer import RendererConfig, render_rays_chunked

H = W = None  # set in main


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    SB, NV, H, W = 1, 4, 512, 640

    cfg = PixelNeRFConfig(compute_dtype="bfloat16")  # flagship
    model = PixelNeRF(cfg=cfg)

    imgs = jnp.asarray(rng.uniform(0, 1, (SB, NV, H, W, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.45, 0.75, (SB, NV, H, W, 1)),
                         jnp.float32)
    stds = jnp.asarray(rng.uniform(0.005, 0.03, (SB, NV, H, W, 1)),
                       jnp.float32)
    extr = np.tile(np.eye(4, dtype=np.float32), (SB, NV, 1, 1))
    for v in range(NV):
        extr[:, v, 0, 3] = 0.05 * v
    extr = jnp.asarray(extr)
    K = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]],
                 np.float32)
    intr = jnp.asarray(np.tile(K, (SB, NV, 1, 1)))

    variables = model.init(jax.random.PRNGKey(0), imgs, depths, stds,
                           extr, intr,
                           jnp.zeros((SB, 8, 3)), jnp.zeros((SB, 8, 3)))

    znear = jnp.full((SB,), 0.32)
    zfar = jnp.full((SB,), 1.2)
    rays = gen_rays(extr[:, 0], intr[:, 0], W, H, znear, zfar
                    ).reshape(SB, H * W, 8)

    rows = []
    # r5 matrix: pruned two-stage sampler ON/OFF across the chunk sweep
    # (the r4 pair-table arm lost end-to-end and stays a single continuity
    # row at chunk 4096); chunk 16384 re-probed with full error capture —
    # its r4 HTTP 500 should now surface the AOT fallback's real report.
    arms = [(4096, False, False), (4096, False, True),
            (16384, False, True), (4096, True, False)]
    for chunk, pairs, pruned in arms:
            rcfg = RendererConfig(n_samples=64, n_depth_candidates=1000,
                                  n_gaussian=15, white_bkgd=False,
                                  ray_chunk=chunk,
                                  n_coarse_candidates=125 if pruned else 0,
                                  n_refine_bins=16)

            # A/B switch: the renderer no longer attaches the pair table
            # itself (detached after losing end-to-end, renderer.py NOTE /
            # EVAL_RENDER_r04) — the ON arm must opt in explicitly here.
            @jax.jit
            def render(variables, rays, key):
                ctx, _ = model.apply(
                    variables, imgs, depths, stds, extr, intr,
                    train=True, method="encode", mutable=["batch_stats"])
                if pairs:  # trace-time constant: opt-in fast path
                    ctx = ctx.with_latent_pairs()

                def field_fn(c, xyz, vd):
                    return model.apply(variables, c, xyz, vd,
                                       method="field")
                out = render_rays_chunked(field_fn, ctx, rays, key, rcfg)
                return out.rgb, out.depth

            try:
                t_compile = time.perf_counter()
                rgb, depth = render(variables, rays, jax.random.PRNGKey(1))
                float(jnp.sum(rgb.astype(jnp.float32)))
                t_compile = time.perf_counter() - t_compile
                times = []
                for it in range(3):
                    k = jax.random.PRNGKey(2 + it)
                    t0 = time.perf_counter()
                    rgb, depth = render(variables, rays, k)
                    float(jnp.sum(rgb.astype(jnp.float32)))
                    times.append(time.perf_counter() - t0)
                warm = min(times)
                row = dict(ray_chunk=chunk, pair_table=pairs,
                           pruned_sampler=pruned,
                           warm_s_per_image=round(warm, 3),
                           rays_per_s=round(H * W / warm),
                           compile_incl_s=round(t_compile, 1))
            except Exception as e:  # noqa: BLE001
                # keep the AOT-fallback tail: the real failure behind an
                # HTTP 500 lives deep in the message
                row = dict(ray_chunk=chunk, pair_table=pairs,
                           pruned_sampler=pruned, error=str(e)[:6000])
            rows.append(row)
            print(json.dumps(row), flush=True)

    Path("EVAL_RENDER_r05.json").write_text(json.dumps(
        {"workload": "512x640 target, 4x512x640 src views, 64/1000 "
                     "depth-guided samples, bf16 flagship",
         "rows": rows}, indent=2))
    print("wrote EVAL_RENDER_r05.json")


if __name__ == "__main__":
    main()
