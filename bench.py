"""Benchmark: DINER training-step throughput (fwd+bwd) on one chip.

Headline = the PRODUCTION training step, i.e. the reference's actual DTU
recipe (``configs/train_dtu.yaml:63-65`` + ``src/models/diner.py:229-247``):
512×640 source images, 4 source views, 40 depth-guided samples per ray from
1000 candidates (15 Gaussian), ResNet34 encoder with 64 px padded-PE ring,
512-wide ResnetFC, **64×64 fg-mask patch rendering with MSE + 0.1·VGG19 +
1.0·antibias losses**, full forward+backward+Adam per step. Mixed precision
(bf16 activations, f32 params/BN).

Secondary = the MSE-only step (128-ray reference default scaled to 1024 rays
so the measurement is renderer-bound), round 1's headline, kept for
continuity.

Timing note: on this TPU relay ``block_until_ready`` does NOT wait for
device completion, so every chunk is synced by a host transfer of the loss
scalar; SCAN_STEPS optimizer steps run inside one jit via ``lax.scan`` to
amortize the relay's fixed ~35 ms RPC latency exactly the way a real
training loop does.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"secondary": {...}}. ``vs_baseline`` is measured against round 1's recorded
production-equivalent throughput (the reference publishes no numbers — see
BASELINE.md / BENCH.md).
"""

import json
import time

import jax

# Round-1 recorded number (BENCH_r01.json) was the MSE-only step: 7096.8
# rays/s. The production step adds VGG19 fwd+bwd + antibias on a 4096-ray
# patch; its round-2 baseline is the first production measurement so later
# rounds track the real recipe. Until then, compare against the r01 record.
BASELINE_PROD_RAYS_PER_SEC = 7096.8
BASELINE_MSE_RAYS_PER_SEC = 7096.8
MSE_RAY_BATCH = 1024
SCAN_STEPS = 8
WARMUP = 1
STEPS = 3


def _measure(chunk, state, batch, key, steps=STEPS, warmup=WARMUP):
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, loss = chunk(state, sub)
    float(loss)  # host transfer = true device sync
    times = []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, loss = chunk(state, sub)
        float(loss)
        times.append(time.perf_counter() - t0)
    return min(times) / SCAN_STEPS


def _bench_recipe(production: bool, pruned: bool = False):
    import jax.numpy as jnp

    from diner_tpu.data.synthetic import make_sphere_scene
    from diner_tpu.losses.vgg import init_vgg19_params
    from diner_tpu.models.pixelnerf import PixelNeRFConfig
    from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
    from diner_tpu.renderer import RendererConfig
    from diner_tpu.train.diner import (
        DinerConfig,
        create_state,
        make_train_step,
    )

    cfg = DinerConfig(
        nerf=PixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet34", num_layers=4,
                                         image_padding=64, padding_pe=4),
            d_hidden=512,
            compute_dtype="bfloat16",
        ),
        renderer=RendererConfig(n_samples=40, n_depth_candidates=1000,
                                n_gaussian=15, white_bkgd=False,
                                # two-stage sampler (4x fewer map gathers,
                                # PSNR-parity certified — BENCH.md round 5)
                                n_coarse_candidates=125 if pruned else 0,
                                n_refine_bins=16),
        ray_batch_size=MSE_RAY_BATCH,
        znear=0.8,
        zfar=2.4,
        w_vgg=0.1 if production else 0.0,
        vgg_spatch=64,
        w_antibias=1.0 if production else 0.0,
    )
    batch = make_sphere_scene(H=512, W=640, nv=4)
    vgg_params = init_vgg19_params() if production else None
    model, state = create_state(cfg, jax.random.PRNGKey(0), batch,
                                vgg_params=vgg_params)
    train_step = make_train_step(model, cfg)

    def run_chunk(state, key):
        def body(s, k):
            s2, metrics = train_step(s, batch, k)
            return s2, metrics["total"]
        keys = jax.random.split(key, SCAN_STEPS)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses[-1]

    chunk = jax.jit(run_chunk, donate_argnums=(0,))
    dt = _measure(chunk, state, batch, jax.random.PRNGKey(1))
    return cfg.rays_per_step / dt, dt


def _gather_roof_fractions():
    """Measure the two gather-bound production stages against their bare
    flat-take roofs AT BENCH TIME (VERDICT r3 item 6: the certified bound
    must be re-checked every round, not quoted)."""
    import jax.numpy as jnp
    import numpy as np

    from diner_tpu.ops.grid_sample import grid_sample_bilinear
    from diner_tpu.ops.sampling import ViewMaps, sample_view_maps_fused

    rng = np.random.default_rng(0)

    def measure(fn, *consts, reps=8, iters=2):
        def chain(c, *k):
            def body(c, _):
                ci = jax.lax.convert_element_type(
                    jnp.mod(jnp.nan_to_num(c), 128.0), jnp.int32)
                return fn(ci, *k), ()
            c, _ = jax.lax.scan(body, c, None, length=reps)
            return c

        compiled = jax.jit(chain).lower(jnp.zeros(()), *consts).compile()
        c = compiled(jnp.zeros(()), *consts)
        float(jnp.asarray(c, jnp.float32))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            c = compiled(c, *consts)
            float(jnp.asarray(c, jnp.float32))
            times.append(time.perf_counter() - t0)
        return min(times) * 1e3 / reps

    # sampler: production fused 5-ch map gather vs the bare flat take
    N_TABLE, N_IDX = 4 * 512 * 640, 4 * 1024 * 1000
    table = jnp.asarray(rng.standard_normal((N_TABLE, 5)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N_TABLE, N_IDX), jnp.int32)

    def take(c, t, i):
        g = t[(i + c) % N_TABLE]
        return jnp.sum(g[::1024].astype(jnp.float32))
    roof_ms = measure(take, table, idx)

    SB, NV, H, W = 1, 4, 512, 640
    views = ViewMaps(
        depths=jnp.asarray(rng.uniform(0.5, 2.0, (SB, NV, H, W, 1)),
                           jnp.float32),
        depth_stds=jnp.asarray(rng.uniform(0.01, 0.1, (SB, NV, H, W, 1)),
                               jnp.float32),
        normals=jnp.asarray(rng.standard_normal((SB, NV, H, W, 3)),
                            jnp.float32),
        poses=jnp.zeros((SB, NV, 4, 4)), focal=jnp.ones((SB, NV, 2)),
        c=jnp.ones((SB, NV, 2)), image_wh=jnp.asarray([W, H], jnp.float32))
    uv2 = jnp.asarray(rng.uniform(-1.1, 1.1, (SB, NV, 1024 * 1000, 2)),
                      jnp.float32)

    def maps_stage(c, v, u):
        d, s, n = sample_view_maps_fused(v, u + c.astype(jnp.float32) * 1e-7)
        return (jnp.sum(d[..., ::997, :].astype(jnp.float32))
                + jnp.sum(n[..., ::997, :].astype(jnp.float32)))
    maps_ms = measure(maps_stage, views, uv2)

    # field: production bilinear latent lookup vs 4 bare C=512 takes
    NVf, Hf, Wf, Cf = 4, 320, 384, 512
    latent = jnp.asarray(rng.standard_normal((NVf, Hf, Wf, Cf)),
                         jnp.bfloat16)
    P = 163_840 // NVf
    uv = jnp.asarray(rng.uniform(-1, 1, (NVf, P, 2)), jnp.float32)
    t512 = latent.reshape(-1, Cf)
    idx5 = jnp.asarray(rng.integers(0, NVf * Hf * Wf, NVf * P), jnp.int32)

    def take512(c, t, i):
        g = t[(i + c) % (NVf * Hf * Wf)]
        return jnp.sum(g[::1024].astype(jnp.float32))
    take512_ms = measure(take512, t512, idx5)

    def bil(c, lat, u):
        g = grid_sample_bilinear(lat, u + c.astype(jnp.float32) * 1e-7,
                                 "border")
        return jnp.sum(g[:, ::701].astype(jnp.float32))
    bil_ms = measure(bil, latent, uv)

    return {
        "sampler_maps": round(100 * roof_ms / maps_ms, 1),
        "field_bilinear": round(100 * 4 * take512_ms / bil_ms, 1),
        "note": "production gather stage as % of its bare flat-take roof "
                "(re-measured this run; see GATHER_ROOF/GATHER_LAB "
                "artifacts for the full certification)",
    }


def main():
    # timing-honesty guard: on the relay a trivial synced program must sit
    # at/above the RPC floor; a ~0 reading means the sync is a no-op and
    # every number below would be fiction (see utils/profiling.py)
    from diner_tpu.utils.profiling import assert_honest_sync
    floor = 1e-3 if jax.default_backend() not in ("cpu",) else 0.0
    assert_honest_sync(min_floor_s=floor)

    prod_rays, prod_dt = _bench_recipe(production=True, pruned=True)
    prod1_rays, prod1_dt = _bench_recipe(production=True, pruned=False)
    mse_rays, mse_dt = _bench_recipe(production=False)
    try:
        roof = _gather_roof_fractions()
    except Exception as e:  # the headline must survive a roof-probe failure
        roof = {"error": str(e)[:200]}
    print(json.dumps({
        "metric": "diner_production_train_rays_per_sec_fwdbwd_512x640_4views",
        "value": round(prod_rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(prod_rays / BASELINE_PROD_RAYS_PER_SEC, 3),
        "secondary": {
            "metric": "diner_mse_train_rays_per_sec_fwdbwd_512x640_4views",
            "value": round(mse_rays, 1),
            "unit": "rays/s",
            "vs_baseline": round(mse_rays / BASELINE_MSE_RAYS_PER_SEC, 3),
            "production_step_ms": round(prod_dt * 1e3, 2),
            "production_onestage_rays_per_sec": round(prod1_rays, 1),
            "production_onestage_step_ms": round(prod1_dt * 1e3, 2),
            "mse_step_ms": round(mse_dt * 1e3, 2),
            "sampler_note": "headline uses the two-stage pruned sampler "
                            "(n_coarse=125, M=16; 253 map gathers/ray vs "
                            "1000 — PSNR-parity A/B in BENCH.md round 5); "
                            "production_onestage_* is the reference "
                            "one-stage path for continuity with r01-r04",
            "pct_gather_roof": roof,
        },
    }))


if __name__ == "__main__":
    main()
