#!/usr/bin/env python
"""Measure this chip's achievable RANDOM-GATHER throughput at the hot shapes.

VERDICT r2 item 1: the claim "sampler+field are gather-bound at ~the bound"
was asserted from hand counts, never against a *measured* gather roof. This
script measures that roof directly:

  (a) flat axis-0 take from a (SB*NV*H*W, C) table at 4.096 M indices —
      uniform-random and projection-clustered (patch rays land on nearby
      texels), across row widths C — the sampler's map-gather primitive
      (`ops/sampling.py sample_view_maps_fused`, reference
      `src/models/nerf_renderer.py:107-116`);
  (b) the 4-corner bilinear gather from the (4, 320, 384, 512) bf16 latent
      at 163,840 points, fwd and fwd+scatter-add-bwd — the field stage's
      latent lookup (`ops/grid_sample.py`, reference
      `src/models/image_encoder.py:97-123`);
  (c) the actual production stages (sample_view_maps_fused, grid_sample
      bilinear) at their exact shapes, to place them against (a)/(b).

Throughput is reported as USEFUL bytes (rows actually requested x row
bytes) / time. Results land in GATHER_ROOF.json for merging into
ROOFLINE_r03.json. Run:  python -u scripts/gather_roof.py
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

REPS = 16


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def _measure(fn, *consts, reps=REPS, iters=3):
    """Time fn(carry, *consts) amortized over an in-graph scan chain.

    fn receives an int32 perturbation (derived from the running f32 carry)
    and must return a scalar f32 that depends on its gather so XLA cannot
    CSE the reps."""

    def chain(c, *k):
        def body(c, _):
            ci = jax.lax.convert_element_type(
                jnp.mod(jnp.nan_to_num(c), 128.0), jnp.int32)
            return fn(ci, *k), ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    compiled = jax.jit(chain).lower(jnp.zeros(()), *consts).compile()
    c = compiled(jnp.zeros(()), *consts)
    _sync(c)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = compiled(c, *consts)
        _sync(c)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3 / reps


def main():
    backend = jax.default_backend()
    print(f"backend={backend}", flush=True)
    rows = []

    def record(name, ms, useful_mb, extra=None):
        row = dict(stage=name, ms=round(ms, 3), useful_mb=round(useful_mb, 1),
                   gbps=round(useful_mb / ms, 2))
        if extra:
            row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    rng = np.random.default_rng(0)

    # ---------------------------------------------------------------- (a)
    # Flat axis-0 take roof: table (1.31 M, C), 4.096 M indices.
    N_TABLE = 4 * 512 * 640            # SB*NV*H*W = 1,310,720
    N_IDX = 4 * 1024 * 1000            # SB*NV*RAYS*CAND = 4,096,000
    idx_uniform = jnp.asarray(rng.integers(0, N_TABLE, N_IDX, dtype=np.int64),
                              jnp.int32)

    # projection-clustered: 1024 "rays" whose 1000 candidates each land in a
    # +-1.5-row window around a per-ray center (what patch rays actually do:
    # a candidate line projects to a short epipolar segment), x4 views
    centers = rng.integers(0, 512 * 640, 1024)
    jitter = rng.integers(-640 - 320, 640 + 320, (1024, 1000))
    per_view = (centers[:, None] + jitter).clip(0, 512 * 640 - 1)
    base = (np.arange(4) * 512 * 640)[:, None, None]
    idx_clustered = jnp.asarray(
        (per_view[None] + base).reshape(-1).astype(np.int64), jnp.int32)

    for C, dt, tag in ((5, jnp.float32, "f32"), (5, jnp.bfloat16, "bf16"),
                       (1, jnp.float32, "f32"), (128, jnp.bfloat16, "bf16"),
                       (512, jnp.bfloat16, "bf16")):
        table = jnp.asarray(rng.standard_normal((N_TABLE, C)), dt)
        bytes_per_row = C * table.dtype.itemsize
        n_idx = N_IDX if C <= 8 else N_IDX // 25  # keep big-row cases sane
        for idx, kind in ((idx_uniform[:n_idx], "uniform"),
                          (idx_clustered[:n_idx], "clustered")):
            def take(c, t, i):
                g = t[(i + c) % N_TABLE]
                return jnp.sum(g[::1024].astype(jnp.float32))
            ms = _measure(take, table, idx)
            record(f"flat take ({n_idx/1e6:.2f}M idx, C={C} {tag}, {kind})",
                   ms, n_idx * bytes_per_row / 1e6)

    # sorted indices: the locality ceiling for tile-sorted access
    idx_sorted = jnp.sort(idx_uniform)
    table5 = jnp.asarray(rng.standard_normal((N_TABLE, 5)), jnp.float32)

    def take_sorted(c, t, i):
        g = t[jnp.clip(i + c, 0, N_TABLE - 1)]
        return jnp.sum(g[::1024].astype(jnp.float32))
    ms = _measure(take_sorted, table5, idx_sorted)
    record("flat take (4.10M idx, C=5 f32, SORTED)", ms, N_IDX * 20 / 1e6)

    # ---------------------------------------------------------------- (b)
    # bilinear latent gather: (4, 320, 384, 512) bf16, 163,840 points
    from diner_tpu.ops.grid_sample import grid_sample_bilinear
    NV, Hf, Wf, Cf = 4, 320, 384, 512
    latent = jnp.asarray(rng.standard_normal((NV, Hf, Wf, Cf)), jnp.bfloat16)
    P = 163_840 // NV  # points per view row (grid_sample batches over N)
    uv = jnp.asarray(rng.uniform(-1, 1, (NV, P, 2)), jnp.float32)
    useful_mb = NV * P * Cf * 2 * 4 / 1e6  # 4 corners x bf16 rows

    def bil_fwd(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        g = grid_sample_bilinear(lat, u2, "border")
        return jnp.sum(g[:, ::701].astype(jnp.float32))
    ms = _measure(bil_fwd, latent, uv)
    record(f"bilinear gather fwd ({NV*P} pts, 512ch bf16 latent)",
           ms, useful_mb)

    def bil_fwdbwd(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7

        def f(l):
            g = grid_sample_bilinear(l, u2, "border")
            return jnp.sum(g[:, ::701].astype(jnp.float32))
        val, grad = jax.value_and_grad(f)(lat)
        return val + jnp.sum(grad[:, 0, 0, :4].astype(jnp.float32))
    ms = _measure(bil_fwdbwd, latent, uv)
    record(f"bilinear gather fwd+bwd scatter-add ({NV*P} pts)",
           ms, 2 * useful_mb, {"note": "useful = fwd reads + bwd writes"})

    # ---------------------------------------------------------------- (c)
    # the actual sampler map stage at its exact production shapes
    from diner_tpu.ops.sampling import ViewMaps, sample_view_maps_fused
    SB, NVs, H, W = 1, 4, 512, 640
    views = ViewMaps(
        depths=jnp.asarray(rng.uniform(0.5, 2.0, (SB, NVs, H, W, 1)),
                           jnp.float32),
        depth_stds=jnp.asarray(rng.uniform(0.01, 0.1, (SB, NVs, H, W, 1)),
                               jnp.float32),
        normals=jnp.asarray(rng.standard_normal((SB, NVs, H, W, 3)),
                            jnp.float32),
        poses=jnp.zeros((SB, NVs, 4, 4)),
        focal=jnp.ones((SB, NVs, 2)),
        c=jnp.ones((SB, NVs, 2)),
        image_wh=jnp.asarray([W, H], jnp.float32))
    P2 = 1024 * 1000
    uv2 = jnp.asarray(rng.uniform(-1.1, 1.1, (SB, NVs, P2, 2)), jnp.float32)

    def maps_stage(c, v, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        d, s, n = sample_view_maps_fused(v, u2)
        return (jnp.sum(d[..., ::997, :].astype(jnp.float32))
                + jnp.sum(n[..., ::997, :].astype(jnp.float32)))
    ms = _measure(maps_stage, views, uv2)
    record("PRODUCTION sample_view_maps_fused (4 views x 1.02M pts)",
           ms, SB * NVs * P2 * 5 * 4 / 1e6)

    out = {"backend": backend, "reps": REPS, "stages": rows}
    Path("GATHER_ROOF.json").write_text(json.dumps(out, indent=2))
    print("\nwrote GATHER_ROOF.json")


if __name__ == "__main__":
    main()
