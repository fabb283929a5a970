#!/usr/bin/env python
"""Characterize the relay compile-helper HTTP 500 wall (round-5 item 2).

The axon relay's remote_compile helper has died with an opaque
``HTTP 500: tpu_compile_helper subprocess exit code 1`` on three separate
measurements (NOVEL/NOVEL_PE 256² train steps, ray_chunk=16384 full-image
eval, round-1 full MVS graphs). This probe bisects WHICH sub-graph kills it
and at what size: it lowers each requested (sub)graph locally, records the
StableHLO module size (bytes of ``lower().as_text()`` — a backend-agnostic
graph-size proxy), then attempts the remote ``.compile()`` and records
ok/failure + wall time.

Usage (TPU):
    python -u scripts/compile_probe.py --suite novel --hw 256,256
    python -u scripts/compile_probe.py --suite novel --stages encode,step
    python -u scripts/compile_probe.py --suite diner_chunk \
        --chunks 4096,8192,16384

Writes/merges COMPILE_PROBE_r05.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from diner_tpu.utils.platform import respect_env_platform  # noqa: E402
respect_env_platform()
# NOTE: deliberately no enable_compilation_cache() — a cached hit would
# report "ok" without exercising the remote compile helper at all.

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def probe(name, fn, *args, results=None):
    """Lower, measure HLO size, then try the remote compile."""
    row = {"stage": name}
    t0 = time.perf_counter()
    try:
        lowered = jax.jit(fn).lower(*args)
        txt = lowered.as_text()
        row["hlo_bytes"] = len(txt)
        row["hlo_lines"] = txt.count("\n")
        row["lower_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:  # noqa: BLE001
        row["lower_error"] = str(e)[:300]
        results.append(row)
        print(json.dumps(row), flush=True)
        return row
    t0 = time.perf_counter()
    try:
        lowered.compile()
        row["compile_s"] = round(time.perf_counter() - t0, 1)
        row["ok"] = True
    except Exception as e:  # noqa: BLE001
        row["compile_s"] = round(time.perf_counter() - t0, 1)
        row["ok"] = False
        # keep enough of the message to include the relay's chipless AOT
        # fallback report — it carries the REAL failure (e.g. the HBM OOM
        # allocation table behind an opaque HTTP 500; see
        # MVS_SELECTIVE_REMAT_r05.json)
        row["error"] = str(e)[:6000]
    results.append(row)
    print(json.dumps(row), flush=True)
    return row


def novel_suite(H, W, stages, dtype, results):
    from diner_tpu.data.loader import DataLoader
    from diner_tpu.geometry import gen_rays
    from diner_tpu.models.novel.model import make_gen_context
    from diner_tpu.models.novel.renderer import render_rays_novel
    from diner_tpu.models.novel.train import (
        build_novel_run_config, compute_novel_losses, create_novel_state,
        make_novel_train_step)
    from diner_tpu.train.config import load_train_config
    from scripts.smoke_variants import YAML

    work = Path("/tmp/compile_probe")
    work.mkdir(exist_ok=True)
    cfg_path = work / "NOVEL.yaml"
    cfg_path.write_text(YAML.format(work=work, model="NOVEL", H=H, W=W,
                                    dtype=dtype))
    run_cfg = load_train_config(cfg_path, model_name="NOVEL")
    run_cfg.model_name = "NOVEL"
    train_set = run_cfg.build_dataset("train")
    batch = {k: jnp.asarray(v) for k, v in next(iter(DataLoader(
        train_set, batch_size=1, num_workers=0))).items()
        if isinstance(v, np.ndarray)}

    cfg = build_novel_run_config(run_cfg, use_pe=False)
    model, state = create_novel_state(cfg, jax.random.PRNGKey(0), batch,
                                      None)
    key = jax.random.PRNGKey(1)
    b = batch
    SB, _, _, _ = b["target_rgb"].shape
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if "encode" in stages:
        def encode(v, b):
            return model.apply(
                v, b["src_rgbs"], b["src_depths"], b["src_depth_stds"],
                b["src_extrinsics"], b["src_intrinsics"], train=True,
                method="encode", mutable=["batch_stats"])
        probe(f"novel_encode_{H}x{W}", encode, variables, batch,
              results=results)

    if "render" in stages:
        def render(v, b, k):
            ctx, _ = model.apply(
                v, b["src_rgbs"], b["src_depths"], b["src_depth_stds"],
                b["src_extrinsics"], b["src_intrinsics"], train=True,
                method="encode", mutable=["batch_stats"])
            gen = make_gen_context(b["gen_extrinsics"], b["gen_intrinsics"],
                                  (W, H))
            znear = jnp.full((SB,), cfg.znear)
            zfar = jnp.full((SB,), cfg.zfar)
            rays = gen_rays(b["target_extrinsics"], b["target_intrinsics"],
                            W, H, znear, zfar).reshape(SB, H * W, 8)

            def field_fn(c, g, xyz, gxyz, vd):
                return model.apply(v, c, g, xyz, gxyz, vd, method="field")
            return render_rays_novel(
                field_fn, ctx, gen, rays[:, :cfg.ray_batch_size],
                b["target_vertices"], b["offset_target_to_source"],
                b["offset_target_to_gen"], k, cfg.renderer).rgb
        probe(f"novel_render_{H}x{W}", render, variables, batch, key,
              results=results)

    if "loss" in stages:
        def loss(p, b, k):
            return compute_novel_losses(model, cfg, p, state.batch_stats,
                                        None, b, k)[0]
        probe(f"novel_lossfwd_{H}x{W}", loss, state.params, batch, key,
              results=results)

    if "grad" in stages:
        def lossgrad(p, b, k):
            def f(p):
                return compute_novel_losses(model, cfg, p,
                                            state.batch_stats, None, b,
                                            k)[0]
            return jax.grad(f)(p)
        probe(f"novel_lossgrad_{H}x{W}", lossgrad, state.params, batch, key,
              results=results)

    if "step" in stages:
        step_fn = make_novel_train_step(model, cfg)
        probe(f"novel_step_{H}x{W}", step_fn, state, batch, key,
              results=results)


def diner_chunk_suite(chunks, results):
    """Full-image DINER eval graph at varying ray_chunk (the
    EVAL_RENDER_r04 16384 failure)."""
    from diner_tpu.data.synthetic import make_sphere_scene
    from diner_tpu.train.config import load_train_config  # noqa: F401
    from diner_tpu.train.diner import (
        DinerConfig, create_state, make_eval_step)

    H, W = 512, 640
    batch = {k: jnp.asarray(v) for k, v in
             make_sphere_scene(H=H, W=W, nv=4).items()}
    for chunk in chunks:
        from dataclasses import replace
        from diner_tpu.renderer.renderer import RendererConfig
        cfg = DinerConfig(renderer=RendererConfig(
            n_samples=64, n_depth_candidates=1000, n_gaussian=24,
            ray_chunk=chunk), znear=0.8, zfar=2.4)
        model, state = create_state(cfg, jax.random.PRNGKey(0), batch, None)
        eval_fn = make_eval_step(model, cfg)
        probe(f"diner_eval_chunk{chunk}", eval_fn, state, batch,
              jax.random.PRNGKey(1), results=results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="novel",
                    choices=["novel", "diner_chunk"])
    ap.add_argument("--hw", default="256,256")
    ap.add_argument("--stages", default="encode,render,loss,grad,step")
    ap.add_argument("--chunks", default="4096,8192,16384")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="COMPILE_PROBE_r05.json")
    args = ap.parse_args()

    out_path = REPO / args.out
    merged = json.loads(out_path.read_text()) if out_path.exists() else {
        "backend": jax.default_backend(), "rows": []}
    results = []
    try:
        if args.suite == "novel":
            H, W = (int(x) for x in args.hw.split(","))
            novel_suite(H, W, args.stages.split(","), args.dtype, results)
        else:
            diner_chunk_suite([int(c) for c in args.chunks.split(",")],
                              results)
    finally:
        merged["rows"].extend(results)
        out_path.write_text(json.dumps(merged, indent=2))
        print(f"wrote {out_path} ({len(merged['rows'])} rows)", flush=True)


if __name__ == "__main__":
    main()
