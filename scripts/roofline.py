#!/usr/bin/env python
"""MFU / speed-of-light accounting for the DINER training step on one chip.

For each stage of the hot path (encode, sampler, field MLP, full render,
VGG loss, full MSE step, full production step) this measures, from ONE
AOT-compiled program per stage (compiles on this relay cost minutes, so the
same executable serves both numbers):
  - XLA cost analysis: FLOPs + bytes accessed (SURVEY §5 prescription);
  - amortized wall time (REPS in-graph repetitions via lax.scan, one honest
    host-transfer sync — see BENCH.md "Timing methodology");
  - % of the measured device roof: compute stages against the bf16 matmul
    roof, gather-bound stages against measured HBM stream bandwidth.

Progress prints per stage (compiles are slow); final JSON lands in
ROOFLINE_r03.json plus a markdown table for BENCH.md.
Run on the TPU:  python -u scripts/roofline.py
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

REPS = 8
RAYS = 1024


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def _measure(fn, carry0, *consts, reps=REPS, iters=3):
    """AOT-compile a reps× scan chain of fn once; return (ms_per_rep,
    flops_per_rep, bytes_per_rep) from the same executable.

    Large operands (scene context, ray batches) MUST be passed via
    ``consts`` — a closed-over array is embedded as an HLO constant and
    blows the relay's remote-compile request limit (HTTP 413).
    """

    def chain(c, *k):
        def body(c, _):
            return fn(c, *k), ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    t0 = time.perf_counter()
    compiled = jax.jit(chain).lower(carry0, *consts).compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", 0.0)) / reps
    bytes_ = float(ca.get("bytes accessed", 0.0)) / reps

    c = compiled(carry0, *consts)
    _sync(c)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = compiled(c, *consts)
        _sync(c)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3 / reps, flops, bytes_, compile_s


def measure_roofs():
    """Measured ceilings: bf16 matmul TFLOP/s and HBM stream GB/s."""
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    ms, *_ = _measure(lambda c, aa: (c @ aa).astype(jnp.bfloat16), a, a,
                      reps=16)
    tflops = 2 * n ** 3 / (ms * 1e-3) / 1e12

    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB
    ms_cp, *_ = _measure(lambda c: c + 1.0, big, reps=16)
    gbps = 2 * big.size * 4 / (ms_cp * 1e-3) / 1e9  # read + write
    return tflops, gbps


def main():
    from diner_tpu.data.synthetic import make_sphere_scene
    from diner_tpu.losses.vgg import init_vgg19_params, vgg_loss
    from diner_tpu.models.pixelnerf import PixelNeRFConfig
    from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
    from diner_tpu.ops.sampling import fill_up_uniform, sample_depthguided
    from diner_tpu.renderer import RendererConfig, render_rays
    from diner_tpu.geometry import gen_rays
    from diner_tpu.train.diner import (
        DinerConfig, create_state, make_train_step)
    from diner_tpu.utils.profiling import assert_honest_sync

    backend = jax.default_backend()
    assert_honest_sync(min_floor_s=1e-3 if backend != "cpu" else 0.0)
    print(f"backend={backend}", flush=True)

    cfg = DinerConfig(
        nerf=PixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet34", num_layers=4,
                                         image_padding=64, padding_pe=4),
            d_hidden=512, compute_dtype="bfloat16"),
        renderer=RendererConfig(n_samples=40, n_depth_candidates=1000,
                                n_gaussian=15, white_bkgd=False),
        ray_batch_size=RAYS, znear=0.8, zfar=2.4)
    prod_cfg = DinerConfig(
        nerf=cfg.nerf, renderer=cfg.renderer, ray_batch_size=RAYS,
        znear=0.8, zfar=2.4, w_vgg=0.1, vgg_spatch=64, w_antibias=1.0)

    batch = make_sphere_scene(H=512, W=640, nv=4)
    model, state = create_state(cfg, jax.random.PRNGKey(0), batch)
    vggp = init_vgg19_params()
    prod_state = state.replace(vgg_params=vggp)
    print("state ready", flush=True)

    H, W = 512, 640
    SB = 1
    znear = jnp.full((SB,), cfg.znear)
    zfar = jnp.full((SB,), cfg.zfar)
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, znear, zfar).reshape(SB, H * W, 8)[:, : RAYS]

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def encode(params):
        v = {"params": params, "batch_stats": state.batch_stats}
        ctx, _ = model.apply(v, batch["src_rgbs"], batch["src_depths"],
                             batch["src_depth_stds"],
                             batch["src_extrinsics"],
                             batch["src_intrinsics"], train=True,
                             method="encode", mutable=["batch_stats"])
        return ctx

    ctx0 = jax.jit(encode)(state.params)
    print("ctx ready", flush=True)

    tflops_roof, gbps_roof = measure_roofs()
    print(f"roofs: {tflops_roof:.1f} bf16 TFLOP/s, {gbps_roof:.0f} GB/s",
          flush=True)

    rows = []

    def record(name, kind, fn, carry0, *consts):
        ms, f, b, cs = _measure(fn, carry0, *consts)
        row = dict(stage=name, gflops=round(f / 1e9, 2),
                   mb=round(b / 1e6, 1), ms=round(ms, 2), kind=kind,
                   compile_s=round(cs, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    # 1. encode (carry a scalar through params so scan reps aren't CSE'd)
    def encode_stage(c, params):
        p = jax.tree_util.tree_map(
            lambda t: (t + c * jnp.zeros((), t.dtype)).astype(t.dtype)
            if jnp.issubdtype(t.dtype, jnp.floating) else t, params)
        ctx = encode(p)
        return jnp.sum(ctx.latent[0, 0, 0, 0, :8].astype(jnp.float32))

    record("encode fwd (4x512x640 resnet34+ring)", "compute",
           encode_stage, jnp.zeros(()), state.params)

    # 2. sampler
    def sampler_stage(c, ctx, r0):
        r = r0 + c * 0.0
        key = jax.random.PRNGKey(0)
        u = jax.random.uniform(key,
                               (SB, RAYS, cfg.renderer.n_depth_candidates))
        g = jax.random.normal(key, (SB, RAYS, cfg.renderer.n_gaussian))
        uf = jax.random.uniform(key, (SB, RAYS, cfg.renderer.n_samples))
        z = sample_depthguided(r, ctx.view_maps(), cfg.renderer.n_samples,
                               cfg.renderer.n_depth_candidates, u, g,
                               cfg.renderer.n_gaussian)
        z = fill_up_uniform(z, r, uf)
        return jnp.sum(z) * 1e-9

    record(f"sampler fwd ({RAYS} rays x 1000 cand, 5ch gather)", "memory",
           sampler_stage, jnp.zeros(()), ctx0, rays)

    # 3. field MLP fwd
    K = cfg.renderer.n_samples
    pts = jnp.zeros((SB, RAYS * K, 3)) + rays[:, :1, :3]
    dirs = jnp.broadcast_to(rays[:, :1, 3:6], pts.shape)

    def field_stage(c, v, ctx, p0, d0):
        out = model.apply(v, ctx, p0 + c * 0.0, d0, method="field")
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    record(f"field MLP fwd ({RAYS * K} pts x 4 views, d=512)", "compute",
           field_stage, jnp.zeros(()), variables, ctx0, pts, dirs)

    # 4. full render fwd
    def render_stage(c, v, ctx, r0):
        out = render_rays(
            lambda cc, xyz, vd: model.apply(v, cc, xyz, vd,
                                            method="field"),
            ctx, r0 + c * 0.0, jax.random.PRNGKey(0), cfg.renderer)
        return jnp.sum(out.rgb.astype(jnp.float32)) * 1e-9

    record("render fwd (sampler+field+composite)", "compute",
           render_stage, jnp.zeros(()), variables, ctx0, rays)

    # 5. VGG loss fwd (bf16 production path)
    patch = jnp.zeros((SB, 64, 64, 3), jnp.float32)

    def vgg_stage(c, vp, pt):
        return vgg_loss(vp, pt + c * 0.0, pt,
                        dtype=jnp.bfloat16).astype(jnp.float32)

    record("VGG19 loss fwd (64x64 patch, bf16)", "compute",
           vgg_stage, jnp.zeros(()), vggp, patch)

    # 6/7. full steps (state carried through the scan)
    for name, st, stepper in (
            ("full MSE step (1024 rays, fwd+bwd+Adam)", state,
             make_train_step(model, cfg)),
            ("full production step (4096-ray patch, MSE+VGG+antibias)",
             prod_state, make_train_step(model, prod_cfg))):

        def chain(s, b):
            def body(s, k):
                s2, m = stepper(s, b, k)
                return s2, m["total"]
            keys = jax.random.split(jax.random.PRNGKey(1), REPS)
            s, losses = jax.lax.scan(body, s, keys)
            return s, losses[-1]

        t0 = time.perf_counter()
        compiled = jax.jit(chain).lower(st, batch).compile()
        cs = time.perf_counter() - t0
        ca = compiled.cost_analysis() or {}
        f = float(ca.get("flops", 0.0)) / REPS
        b = float(ca.get("bytes accessed", 0.0)) / REPS
        st2, loss = compiled(st, batch)
        _sync(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            st2, loss = compiled(st2, batch)
            _sync(loss)
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / REPS
        row = dict(stage=name, gflops=round(f / 1e9, 2),
                   mb=round(b / 1e6, 1), ms=round(ms, 2), kind="compute",
                   compile_s=round(cs, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    for r in rows:
        # GFLOP / ms == TFLOP/s; MB / ms == GB/s
        r["achieved_tflops"] = round(r["gflops"] / r["ms"], 2)
        r["logical_gbps"] = round(r["mb"] / r["ms"], 1)
        if r["kind"] == "compute":
            r["pct_roof"] = round(100 * r["achieved_tflops"] / tflops_roof, 1)
        else:
            # NOTE: XLA 'bytes accessed' is LOGICAL (per-instruction operand
            # accounting); it can exceed physical HBM traffic several-fold.
            # pct_roof for memory stages is vs the stream roof on logical
            # bytes — interpret with the hand counts in BENCH.md.
            r["pct_roof"] = round(100 * r["logical_gbps"] / gbps_roof, 1)

    out = {
        "backend": backend,
        "roof_bf16_tflops": round(tflops_roof, 2),
        "roof_hbm_gbps": round(gbps_roof, 1),
        "rays": RAYS,
        "reps_per_measurement": REPS,
        "stages": rows,
    }

    # merge the measured RANDOM-GATHER roofs (scripts/gather_roof.py —
    # run it first; VERDICT r2 item 1) and place the two gather-bound
    # stages against them.
    gr_path = Path("GATHER_ROOF.json")
    if gr_path.exists():
        gr = json.loads(gr_path.read_text())
        by = {r["stage"]: r for r in gr["stages"]}
        narrow = by.get("flat take (4.10M idx, C=5 f32, uniform)")
        wide = by.get("flat take (0.16M idx, C=512 bf16, uniform)")
        bil = by.get("bilinear gather fwd (163840 pts, 512ch bf16 latent)")
        if not (narrow and wide and bil):
            print("WARNING: GATHER_ROOF.json stage names don't match the "
                  "expected probes; skipping the roof_gather merge "
                  f"(narrow={bool(narrow)} wide={bool(wide)} "
                  f"bil={bool(bil)})")
            narrow = None
    if gr_path.exists() and narrow:
        out["roof_gather"] = {
            "narrow_row_take_ms_at_sampler_shape": narrow["ms"],
            "narrow_row_rate_mrows_per_s": round(4.096e6 / narrow["ms"]
                                                 / 1e3, 1),
            "wide_row_take_gbps": wide["gbps"],
            "bilinear_512ch_fwd_ms_at_field_shape": bil["ms"],
            "note": ("uniform == clustered == sorted (measured): the "
                     "flat-take is per-index-rate-bound; locality/sort "
                     "levers are dead. Wide rows amortize the per-row "
                     "cost (C=512 bf16 reaches ~40 GB/s vs 3.7 GB/s at "
                     "C=5 f32)."),
        }
        for r in rows:
            if r["stage"].startswith("sampler fwd"):
                r["pct_gather_roof"] = round(100 * narrow["ms"] / r["ms"], 1)
            if r["stage"].startswith("field MLP fwd"):
                # gather share of the stage vs the isolated bilinear roof
                r["pct_gather_roof"] = round(100 * bil["ms"] / r["ms"], 1)
    Path("ROOFLINE_r03.json").write_text(json.dumps(out, indent=2))

    print("\n| Stage | GFLOP | MB | ms | achieved | % roof |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['stage']} | {r['gflops']} | {r['mb']} | {r['ms']} "
              f"| {r['achieved_tflops']} TF/s / {r['logical_gbps']} GB/s "
              f"| {r['pct_roof']}% |")


if __name__ == "__main__":
    main()
