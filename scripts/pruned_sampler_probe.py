#!/usr/bin/env python
"""A/B + config sweep for the two-stage pruned depth-guided sampler.

Times the sampler forward at the PRODUCTION shape (4096 rays x 1000
candidates x 4 views over 512x640 maps — the reference recipe
``configs/train_dtu.yaml:54-65`` at the VGG-patch ray count) for the
one-stage baseline and a grid of (n_coarse, n_refine_bins) configs, then
the full production train step (fwd+bwd+Adam) with the best config vs the
one-stage step. Writes PRUNED_SAMPLER_r05.json.

Timing follows bench.py's honesty rules: scan-chained reps inside one jit,
host transfer of a scalar as the sync.
"""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.ops.sampling import (
    ViewMaps,
    sample_depthguided,
    sample_depthguided_pruned,
)

SB, NV, H, W = 1, 4, 512, 640
NR, K, NS, NG = 4096, 1000, 40, 15
REPS = 8


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    depth = (1.5 + 0.2 * np.sin(4 * gx) * np.cos(3 * gy)).astype(np.float32)
    views = ViewMaps(
        depths=jnp.asarray(np.tile(depth, (SB, NV, 1, 1))[..., None]),
        depth_stds=jnp.asarray(
            rng.uniform(0.01, 0.05, (SB, NV, H, W, 1)).astype(np.float32)),
        normals=jnp.asarray(
            np.tile(np.array([0, 0, -1], np.float32),
                    (SB, NV, H, W, 1))),
        poses=jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                  (SB, NV, 1, 1))),
        focal=jnp.full((SB, NV, 2), 500.0),
        c=jnp.asarray(np.tile(np.array([W / 2, H / 2], np.float32),
                              (SB, NV, 1))),
        image_wh=jnp.asarray([float(W), float(H)]),
    )
    origins = np.zeros((SB, NR, 3), np.float32)
    origins[..., 2] = -0.1
    dirs = rng.standard_normal((SB, NR, 3)).astype(np.float32) * 0.1
    dirs[..., 2] = 1.0
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate(
        [origins, dirs,
         np.full((SB, NR, 1), 0.8, np.float32),
         np.full((SB, NR, 1), 2.4, np.float32)], -1)
    return jnp.asarray(rays), views


def timeit(fn, *args, reps=REPS, iters=3):
    def chain(c, *a):
        def body(c, _):
            out = fn(c, *a)
            return jnp.sum(out[..., ::173].astype(jnp.float32)) * 1e-20, ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    compiled = jax.jit(chain).lower(jnp.zeros(()), *args).compile()
    c = compiled(jnp.zeros(()), *args)
    float(c)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = compiled(c, *args)
        float(c)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3 / reps


def main():
    from diner_tpu.utils.profiling import assert_honest_sync
    floor = 1e-3 if jax.default_backend() not in ("cpu",) else 0.0
    assert_honest_sync(min_floor_s=floor)

    rays, views = make_inputs()
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (SB, NR, K))
    gn = jax.random.normal(jax.random.PRNGKey(1), (SB, NR, NG))

    out = {"shape": dict(SB=SB, NV=NV, H=H, W=W, NR=NR, K=K, NS=NS, NG=NG),
           "backend": jax.default_backend(), "configs": []}

    def full(c, rays, views, u, gn):
        return sample_depthguided(rays + c * 1e-20, views, NS, K, u, gn, NG)

    t_full = timeit(full, rays, views, u, gn)
    out["full_ms"] = round(t_full, 2)
    print(f"one-stage sampler fwd: {t_full:.2f} ms", flush=True)

    for n_coarse, m in [(250, 24), (125, 16), (125, 24), (100, 12),
                        (200, 20)]:
        r = K // n_coarse

        def pruned(c, rays, views, u, gn, n_coarse=n_coarse, m=m):
            return sample_depthguided_pruned(
                rays + c * 1e-20, views, NS, K, n_coarse, m, u, gn, NG)

        t = timeit(pruned, rays, views, u, gn)
        gathers = n_coarse + m * r
        out["configs"].append(dict(n_coarse=n_coarse, n_refine_bins=m,
                                   gathers_per_ray=gathers,
                                   ms=round(t, 2),
                                   speedup=round(t_full / t, 2)))
        print(f"pruned {n_coarse=} M={m} ({gathers} idx/ray): {t:.2f} ms "
              f"({t_full / t:.2f}x)", flush=True)

    with open("PRUNED_SAMPLER_r05.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
