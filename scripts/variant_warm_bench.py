#!/usr/bin/env python
"""Warm steady-state numbers for KeypointNeRF / NOVEL / NOVEL_PE.

VERDICT r3 item 4: the round-3 smokes recorded compile-inclusive times
only (and 64x64 renders for the NOVEL pair). This bench compiles first,
then measures N warm train steps and a warm full-size render per
variant — KeypointNeRF at its 256x256 reference protocol
(`src/models/keypointnerf.py:365`, facescape.py:45), NOVEL / NOVEL_PE at
the reference Facescape shape (256x256, 2 src views, `novel/novel.py:20`).

Writes VARIANT_WARM_r04.json. Run:  python -u scripts/variant_warm_bench.py
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from diner_tpu.utils.platform import (
    enable_compilation_cache,
    respect_env_platform,
)
respect_env_platform()  # the relay plugin ignores the env var otherwise
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from scripts.smoke_variants import YAML


def bench_model(model_name, work, H, W, steps, dtype):
    from diner_tpu.data.loader import DataLoader
    from diner_tpu.train.config import load_train_config

    cfg_path = work / f"{model_name}.yaml"
    cfg_path.write_text(YAML.format(
        work=work, model=model_name, H=H, W=W,
        dtype=dtype if model_name != "KeypointNeRF" else "float32"))
    run_cfg = load_train_config(cfg_path, model_name=model_name)
    run_cfg.model_name = model_name
    train_set = run_cfg.build_dataset("train")
    loader = DataLoader(train_set, batch_size=1, shuffle=True,
                        num_workers=0)

    def to_dev(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}

    batches = []
    it = iter(loader)
    for _ in range(min(steps + 1, 8)):
        batches.append(to_dev(next(it)))

    key = jax.random.PRNGKey(1)
    out = {}

    if model_name == "KeypointNeRF":
        from diner_tpu.models.keypointnerf.train import (
            build_keypointnerf_run_config, create_keypointnerf_state,
            make_keypointnerf_train_step, render_full_image)
        cfg = build_keypointnerf_run_config(run_cfg)
        model, state, tx = create_keypointnerf_state(
            cfg, jax.random.PRNGKey(0), batches[0], None)
        step_fn = jax.jit(make_keypointnerf_train_step(model, cfg, tx))

        t0 = time.perf_counter()
        state, losses = step_fn(state, batches[0], key)
        float(losses["e_all"])
        out["first_step_incl_compile_s"] = round(
            time.perf_counter() - t0, 1)
        times = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            b = batches[(i + 1) % len(batches)]
            t0 = time.perf_counter()
            state, losses = step_fn(state, b, sub)
            float(losses["e_all"])
            times.append(time.perf_counter() - t0)
        out["warm_s_per_step"] = round(min(times), 3)
        out["warm_s_per_step_mean"] = round(sum(times) / len(times), 3)
        # full distribution: r4's 0.475 min vs 138 mean was a single relay
        # stall (batch shapes are identical across steps — verified; no
        # recompile is possible), and the list makes that self-evident
        out["warm_step_times_s"] = [round(t, 3) for t in times]

        def render(b, k):
            color, depth = render_full_image(
                model.model if hasattr(model, "model") else model,
                cfg.model, state["params"], b, k)
            return np.asarray(color)

        t0 = time.perf_counter()
        c = render(batches[0], jax.random.PRNGKey(2))
        out["render_incl_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        c = render(batches[1], jax.random.PRNGKey(3))
        out["warm_render_s"] = round(time.perf_counter() - t0, 2)
        out["render_shape"] = list(c.shape)
        assert np.isfinite(c).all()
    else:
        from diner_tpu.geometry import gen_rays
        from diner_tpu.models.novel.model import make_gen_context
        from diner_tpu.models.novel.renderer import render_rays_novel
        from diner_tpu.models.novel.train import (
            build_novel_run_config, create_novel_state,
            make_novel_train_step)
        cfg = build_novel_run_config(
            run_cfg, use_pe=(model_name == "NOVEL_PE"))
        model, state = create_novel_state(cfg, jax.random.PRNGKey(0),
                                          batches[0], None)
        step_fn = jax.jit(make_novel_train_step(model, cfg))

        t0 = time.perf_counter()
        # the relay compile helper dies transiently under concurrent heavy
        # compiles (COMPILE_PROBE_r05: the same step compiles clean solo);
        # one bounded retry rescues the measurement instead of losing it
        for attempt in range(2):
            try:
                state, metrics = step_fn(state, batches[0], key)
                break
            except Exception:
                if attempt == 1:
                    raise
                time.sleep(15)
        float(metrics["total"])
        out["first_step_incl_compile_s"] = round(
            time.perf_counter() - t0, 1)
        times = []
        for i in range(steps):
            key, sub = jax.random.split(key)
            b = batches[(i + 1) % len(batches)]
            t0 = time.perf_counter()
            state, metrics = step_fn(state, b, sub)
            float(metrics["total"])
            times.append(time.perf_counter() - t0)
        out["warm_s_per_step"] = round(min(times), 3)
        out["warm_s_per_step_mean"] = round(sum(times) / len(times), 3)
        out["warm_step_times_s"] = [round(t, 3) for t in times]

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

        @jax.jit
        def render(b, k):
            ctx, _ = model.apply(
                variables, b["src_rgbs"], b["src_depths"],
                b["src_depth_stds"], b["src_extrinsics"],
                b["src_intrinsics"], train=True, method="encode",
                mutable=["batch_stats"])
            gen = make_gen_context(
                b["gen_extrinsics"], b["gen_intrinsics"], (W, H),
                src_pe_maps=b.get("src_pos_encodings"),
                tgt_pe_map=(b["target_pos_encoding"][:, None]
                            if "target_pos_encoding" in b else None))
            znear = jnp.full((1,), cfg.znear)
            zfar = jnp.full((1,), cfg.zfar)
            rays = gen_rays(b["target_extrinsics"],
                            b["target_intrinsics"], W, H, znear,
                            zfar).reshape(1, H * W, 8)

            def field_fn(c, g, xyz, gxyz, vd):
                return model.apply(variables, c, g, xyz, gxyz, vd,
                                   method="field")
            o = render_rays_novel(
                field_fn, ctx, gen, rays, b["target_vertices"],
                b["offset_target_to_source"], b["offset_target_to_gen"],
                k, cfg.renderer)
            return o.rgb

        t0 = time.perf_counter()
        rgb = np.asarray(render(batches[0], jax.random.PRNGKey(2)))
        out["render_incl_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        rgb = np.asarray(render(batches[1], jax.random.PRNGKey(3)))
        out["warm_render_s"] = round(time.perf_counter() - t0, 2)
        out["render_shape"] = [H, W, 3]
        assert np.isfinite(rgb).all()

    out["rays_per_s_render"] = round(H * W / out["warm_render_s"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hw", default="256,256")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--work", default="outputs/variant_warm")
    ap.add_argument("--models", nargs="+",
                    default=["NOVEL", "NOVEL_PE", "KeypointNeRF"])
    ap.add_argument("--out", default="VARIANT_WARM_r05.json")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split(","))
    work = Path(args.work).resolve()
    work.mkdir(parents=True, exist_ok=True)

    results = {"backend": jax.default_backend(), "hw": [H, W],
               "warm_steps": args.steps, "models": {}}
    for m in args.models:
        print(f"[warm] {m}...", flush=True)
        try:
            results["models"][m] = bench_model(m, work, H, W, args.steps,
                                               args.dtype)
        except Exception as e:  # noqa: BLE001
            results["models"][m] = {"error": str(e)[:400]}
        print(json.dumps({m: results["models"][m]}), flush=True)
        # incremental write: a cut-off run still leaves partial results
        (REPO / args.out).write_text(json.dumps(results, indent=2))

    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
