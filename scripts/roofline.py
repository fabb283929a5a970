#!/usr/bin/env python
"""MFU / speed-of-light accounting for the DINER training step on one chip.

For each stage of the hot path (encode, sampler, field MLP, composite,
VGG loss, full MSE step, full production step) this measures:
  - XLA cost analysis: FLOPs + bytes accessed (cost_analysis of the
    compiled program, SURVEY §5 prescription);
  - amortized wall time (N in-graph repetitions via lax.scan, one honest
    host-transfer sync — see BENCH.md "Timing methodology");
  - % of the measured device roof: compute-bound stages against the bf16
    matmul roof, gather stages against the measured HBM copy bandwidth.

Outputs a JSON artifact (ROOFLINE_r02.json) and a markdown table for
BENCH.md. Run on the TPU:  python scripts/roofline.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

REPS = 8
RAYS = 1024


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def _amortized_ms(fn, *args, reps=REPS, iters=3):
    """Scan fn reps× in one jit (threading a carry so XLA can't CSE), sync
    once; returns ms per rep."""

    def run(c, _):
        c = fn(c, *args[1:])
        return c, ()

    @jax.jit
    def chain(c):
        c, _ = jax.lax.scan(run, c, None, length=reps)
        return c

    c = chain(args[0])
    _sync(c)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = chain(c)
        _sync(c)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3 / reps


def _cost(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)))


def measure_roofs():
    """Measured device ceilings: bf16 matmul TFLOP/s and HBM stream GB/s."""
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    def mm(c):
        return (c @ a).astype(jnp.bfloat16)

    ms = _amortized_ms(lambda c: mm(c), a, reps=16)
    tflops = 2 * n ** 3 / (ms * 1e-3) / 1e12

    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB

    def cp(c):
        return c + 1.0

    ms_cp = _amortized_ms(lambda c: cp(c), big, reps=16)
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
    _, prod_state = create_state(prod_cfg, jax.random.PRNGKey(0), batch,
                                 vgg_params=vggp)

    H, W = 512, 640
    SB = 1
    znear = jnp.full((SB,), cfg.znear)
    zfar = jnp.full((SB,), cfg.zfar)
    rays_full = gen_rays(batch["target_extrinsics"],
                         batch["target_intrinsics"], W, H, znear,
                         zfar).reshape(SB, H * W, 8)
    rays = rays_full[:, : RAYS]

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

    def encode_carry(c):
        # carry a scalar through params so scan reps aren't CSE'd
        p = jax.tree_util.tree_map(lambda t: t + c * 0.0, state.params)
        ctx = encode(p)
        return jnp.sum(ctx.latent[0, 0, 0, 0, :8].astype(jnp.float32))

    def sampler(c, r):
        r = r + c * 0.0
        key = jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (SB, RAYS, cfg.renderer.n_depth_candidates))
        g = jax.random.normal(key, (SB, RAYS, cfg.renderer.n_gaussian))
        uf = jax.random.uniform(key, (SB, RAYS, cfg.renderer.n_samples))
        z = sample_depthguided(r, ctx0.view_maps(),
                               cfg.renderer.n_samples,
                               cfg.renderer.n_depth_candidates, u, g,
                               cfg.renderer.n_gaussian)
        z = fill_up_uniform(z, r, uf)
        return c + jnp.sum(z) * 0.0 + jnp.sum(z[..., :1]) * 0.0 + c * 0.0

    K = cfg.renderer.n_samples
    pts = jnp.zeros((SB, RAYS * K, 3)) + rays[:, :1, :3]
    dirs = jnp.broadcast_to(rays[:, :1, 3:6], pts.shape)

    def field(c, p_, d_):
        out = model.apply(variables, ctx0, p_ + c * 0.0, d_, method="field")
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    def render_full(c, r):
        out = render_rays(
            lambda cc, xyz, vd: model.apply(variables, cc, xyz, vd,
                                            method="field"),
            ctx0, r + c * 0.0, jax.random.PRNGKey(0), cfg.renderer)
        return jnp.sum(out.rgb.astype(jnp.float32)) * 1e-9

    patch = jnp.zeros((SB, 64, 64, 3), jnp.float32)

    def vgg(c, a, b):
        return vgg_loss(vggp, a + c * 0.0, b).astype(jnp.float32)

    step_mse = make_train_step(model, cfg)
    step_prod = make_train_step(model, prod_cfg)

    def full_step(st, stepper):
        def body(s, k):
            s2, m = stepper(s, batch, k)
            return s2, m["total"]
        keys = jax.random.split(jax.random.PRNGKey(1), REPS)
        st, losses = jax.lax.scan(body, st, keys)
        return st, losses[-1]

    rows = []

    def add(name, flops, bytes_, ms, kind):
        rows.append(dict(stage=name, gflops=round(flops / 1e9, 2),
                         mb=round(bytes_ / 1e6, 1), ms=round(ms, 2),
                         kind=kind))

    tflops_roof, gbps_roof = measure_roofs()

    f, b = _cost(lambda: encode(state.params))
    ms = _amortized_ms(encode_carry, jnp.zeros(()))
    add("encode fwd (4×512×640 resnet34+ring)", f, b, ms, "compute")

    f, b = _cost(lambda r: sampler(jnp.zeros(()), r), rays)
    ms = _amortized_ms(sampler, jnp.zeros(()), rays)
    add(f"sampler ({RAYS} rays × 1000 cand)", f, b, ms, "memory")

    f, b = _cost(lambda p_, d_: field(jnp.zeros(()), p_, d_), pts, dirs)
    ms = _amortized_ms(field, jnp.zeros(()), pts, dirs)
    add(f"field MLP fwd ({RAYS * K} pts × 4 views)", f, b, ms, "compute")

    f, b = _cost(lambda r: render_full(jnp.zeros(()), r), rays)
    ms = _amortized_ms(render_full, jnp.zeros(()), rays)
    add("render fwd (sampler+field+composite)", f, b, ms, "compute")

    f, b = _cost(lambda a, bb: vgg(jnp.zeros(()), a, bb), patch, patch)
    ms = _amortized_ms(vgg, jnp.zeros(()), patch, patch)
    add("VGG19 loss fwd (64×64 patch)", f, b, ms, "compute")

    for name, st, stepper in (("full MSE step (1024 rays, fwd+bwd+Adam)",
                               state, step_mse),
                              ("full production step (4096-ray patch, "
                               "MSE+VGG+antibias)", prod_state, step_prod)):
        def one(s, k):
            s2, m = stepper(s, batch, k)
            return s2, m["total"]
        f, b = _cost(lambda s, k: one(s, k), st, jax.random.PRNGKey(1))
        chain = jax.jit(lambda s: full_step(s, stepper))
        st2, loss = chain(st)
        _sync(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            st2, loss = chain(st2)
            _sync(loss)
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / REPS
        add(name, f, b, ms, "compute")

    for r in rows:
        if r["kind"] == "compute":
            ach = r["gflops"] / r["ms"] / 1e3  # TFLOP/s
            r["pct_roof"] = round(100 * ach / tflops_roof, 1)
            r["achieved_tflops"] = round(ach, 2)
        else:
            ach = r["mb"] / 1e3 / (r["ms"] * 1e-3)  # GB/s
            r["pct_roof"] = round(100 * ach / gbps_roof, 1)
            r["achieved_gbps"] = round(ach, 1)

    out = {
        "backend": backend,
        "roof_bf16_tflops": round(tflops_roof, 2),
        "roof_hbm_gbps": round(gbps_roof, 1),
        "rays": RAYS,
        "stages": rows,
    }
    Path("ROOFLINE_r02.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))

    print("\n| Stage | GFLOP | MB | ms | achieved | % roof |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        ach = (f"{r.get('achieved_tflops', '')} TF/s"
               if "achieved_tflops" in r else f"{r.get('achieved_gbps')} GB/s")
        print(f"| {r['stage']} | {r['gflops']} | {r['mb']} | {r['ms']} "
              f"| {ach} | {r['pct_roof']}% |")


if __name__ == "__main__":
    main()
