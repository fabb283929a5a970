#!/usr/bin/env python
"""Multi-device scaling harness: DINER train-step rays/s vs mesh size.

On real hardware this measures ICI scaling efficiency (BASELINE.md target:
≥90% from 1 chip to a slice); with a single chip available it can still
validate the sharded program functionally on virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --devices 1 2 4 8 --virtual

Prints one JSON line per mesh size with rays/s and efficiency vs 1 device.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import (
    enable_compilation_cache,
    respect_env_platform,
)
respect_env_platform()
enable_compilation_cache()  # JAX_PLATFORMS=cpu must win over plugin pins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--virtual", action="store_true",
                    help="tiny shapes for CPU-device functional scaling")
    args = ap.parse_args()

    import jax
    if args.virtual:
        # env JAX_PLATFORMS can be pinned by the host; force CPU explicitly
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diner_tpu.data.synthetic import make_sphere_scene
    from diner_tpu.models.pixelnerf import PixelNeRFConfig
    from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
    from diner_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        shard_batch,
    )
    from diner_tpu.renderer import RendererConfig
    from diner_tpu.train.diner import DinerConfig, create_state

    if args.virtual:
        cfg = DinerConfig(
            nerf=PixelNeRFConfig(
                encoder=SpatialEncoderConfig(backbone="resnet18",
                                             num_layers=4, image_padding=8,
                                             padding_pe=4), d_hidden=64),
            renderer=RendererConfig(n_samples=8, n_depth_candidates=64,
                                    n_gaussian=2, white_bkgd=True),
            ray_batch_size=args.rays)
        batch = make_sphere_scene(H=32, W=32, nv=2, sb=2)
    else:
        cfg = DinerConfig(
            nerf=PixelNeRFConfig(
                encoder=SpatialEncoderConfig(backbone="resnet34",
                                             num_layers=4, image_padding=64,
                                             padding_pe=4), d_hidden=512,
                compute_dtype="bfloat16"),
            renderer=RendererConfig(n_samples=40, n_depth_candidates=1000,
                                    n_gaussian=15, white_bkgd=False),
            ray_batch_size=args.rays)
        batch = make_sphere_scene(H=512, W=640, nv=4, sb=2)

    model, state = create_state(cfg, jax.random.PRNGKey(0), batch)

    base_rate = None
    for n in args.devices:
        if n > len(jax.devices()):
            break
        mesh = make_mesh(n, data_parallel=2 if n % 2 == 0 and n > 1 else 1)
        step = make_parallel_train_step(model, cfg, mesh,
                                        donate_state=False)
        sb = shard_batch(batch, mesh)
        key = jax.random.PRNGKey(1)
        st, m = step(state, sb, key)
        float(m["total"])  # warmup + sync
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            st, m = step(st, sb, sub)
            float(m["total"])
        dt = (time.perf_counter() - t0) / args.steps
        rate = args.rays * batch["target_rgb"].shape[0] / dt
        if base_rate is None:
            base_rate = rate / n
        row = {
            "devices": n, "mesh": dict(mesh.shape),
            "rays_per_sec": round(rate, 1),
            "efficiency_vs_1dev": round(rate / (base_rate * n), 3),
        }
        if args.virtual:
            # On a virtual mesh the n devices TIMESHARE the host's physical
            # cores: wall-clock throughput cannot exceed ~cores/devices of
            # linear scaling, so rays/s *declining* with mesh size is the
            # hosting bound, not a sharding defect (numeric equality with
            # the single-device step is the real evidence, test_parallel.py)
            import os as _os
            cores = _os.cpu_count() or 1
            ceiling = min(1.0, cores / n)
            row["host_cores"] = cores
            row["expected_wallclock_ceiling_vs_linear"] = round(ceiling, 3)
            row["throughput_vs_1dev"] = round(rate / base_rate, 3)
            row["expected_throughput_ceiling"] = round(
                min(float(n), float(cores)), 3)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
