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


def _bench_recipe(production: bool):
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
                                n_gaussian=15, white_bkgd=False),
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


def main():
    # timing-honesty guard: on the relay a trivial synced program must sit
    # at/above the RPC floor; a ~0 reading means the sync is a no-op and
    # every number below would be fiction (see utils/profiling.py)
    from diner_tpu.utils.profiling import assert_honest_sync
    floor = 1e-3 if jax.default_backend() not in ("cpu",) else 0.0
    assert_honest_sync(min_floor_s=floor)

    prod_rays, prod_dt = _bench_recipe(production=True)
    mse_rays, mse_dt = _bench_recipe(production=False)
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
            "mse_step_ms": round(mse_dt * 1e3, 2),
        },
    }))


if __name__ == "__main__":
    main()
