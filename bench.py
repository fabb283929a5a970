"""Benchmark: DINER training-step throughput (fwd+bwd) on one chip.

Workload mirrors the reference's DTU training configuration
(``configs/train_dtu.yaml`` + ``src/models/nerf_renderer.py`` defaults):
512×640 source images, 4 source views, 40 depth-guided samples per ray from
1000 candidates (15 Gaussian), ResNet34 encoder with 64 px padded-PE ring,
512-wide ResnetFC, full forward+backward+Adam per step. Rays per step is
raised from the reference's 128 to 1024 so the measurement is renderer-bound
rather than encoder-bound; rays/s counts rendered target rays. Mixed
precision (bf16 activations, f32 params/BN) — the production training
recipe.

Timing note: on this TPU relay ``block_until_ready`` does NOT wait for
device completion, so every step is synced by a host transfer of the loss
scalar (measured overhead ≪ step time).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``BASELINE_RAYS_PER_SEC`` is this framework's round-1 measurement on the
single available TPU v5e-class chip (the reference publishes no numbers —
see BASELINE.md / BENCH.md).
"""

import json
import time

import jax

BASELINE_RAYS_PER_SEC = 5048.0  # round-1 measurement; see BENCH.md
RAY_BATCH = 1024
SCAN_STEPS = 8  # optimizer steps per sync (amortizes relay RPC latency)
WARMUP = 1
STEPS = 3


def main():
    from diner_tpu.data.synthetic import make_sphere_scene
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
        ray_batch_size=RAY_BATCH,
        znear=0.8,
        zfar=2.4,
    )
    batch = make_sphere_scene(H=512, W=640, nv=4)
    model, state = create_state(cfg, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, cfg)

    # Steady-state measurement: SCAN_STEPS optimizer steps inside one jit
    # (state carried through lax.scan, per-step RNG keys), synced ONCE by a
    # host transfer of the final loss. This amortizes the TPU relay's fixed
    # per-call RPC latency (~35 ms, measured with trivial programs) exactly
    # the way a real training loop does; per-step inputs still differ (the
    # key drives pixel selection, candidate jitter, and Gaussian draws).
    import jax.numpy as jnp

    def run_chunk(state, key):
        def body(s, k):
            s2, metrics = train_step(s, batch, k)
            return s2, metrics["total"]
        keys = jax.random.split(key, SCAN_STEPS)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses[-1]

    chunk = jax.jit(run_chunk, donate_argnums=(0,))

    key = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        key, sub = jax.random.split(key)
        state, loss = chunk(state, sub)
    float(loss)  # host transfer = true device sync

    times = []
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, loss = chunk(state, sub)
        float(loss)  # sync once per SCAN_STEPS optimizer steps
        times.append(time.perf_counter() - t0)

    dt = min(times) / SCAN_STEPS
    rays_per_sec = RAY_BATCH / dt
    print(json.dumps({
        "metric": "diner_train_rays_per_sec_fwdbwd_512x640_4views",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
