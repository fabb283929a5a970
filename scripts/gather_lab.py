#!/usr/bin/env python
"""A/B lab for the round-4 gather attack (VERDICT r3 items 1-2).

Candidates measured at the field stage's exact hot shape — the 4-corner
bilinear lookup of 163,840 points in the (4, 320, 384, 512) bf16 latent
(reference ``src/models/image_encoder.py:97-123``) — and at the sampler's
map-row shape (4.1 M indices, 5-channel f32 rows,
``src/models/nerf_renderer.py:107-116``):

  field stage:
    a. current 4-corner per-corner flat takes (the round-3 certified 69%)
    b. x-PAIRED corners as one flat 1-D gather of 2C-contiguous spans
       (2 takes of 163,840 width-1024 rows instead of 4 x width-512)
    c. x-paired corners via parity-concatenated (R, 2C) row table
    d. Pallas per-row DMA gather (double-buffered HBM->VMEM), C=512/1024
    e. paired scatter-add backward vs current 4-corner scatter
  sampler stage:
    f. Pallas DMA gather at a 128-lane-padded table (Mosaic requires
       lane-aligned row slices; C=5 cannot be row-DMA'd unpadded — that
       alignment constraint is itself part of the certification)

Writes GATHER_LAB.json. Run on the chip:  python -u scripts/gather_lab.py
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
    print(f"backend={jax.default_backend()}", flush=True)
    rows = []

    def record(name, ms, useful_mb, extra=None):
        row = dict(stage=name, ms=round(ms, 3), useful_mb=round(useful_mb, 1),
                   gbps=round(useful_mb / ms, 2))
        if extra:
            row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    rng = np.random.default_rng(0)

    # ----------------------------------------------------------- field shape
    NV, Hf, Wf, Cf = 4, 320, 384, 512
    P = 163_840 // NV
    latent = jnp.asarray(rng.standard_normal((NV, Hf, Wf, Cf)), jnp.bfloat16)
    uv = jnp.asarray(rng.uniform(-1, 1, (NV, P, 2)), jnp.float32)
    useful_mb = NV * P * Cf * 2 * 4 / 1e6  # 4 corners x bf16 rows

    from diner_tpu.ops.grid_sample import (
        grid_sample_bilinear, _unnormalize)

    def bil_fwd(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        g = grid_sample_bilinear(lat, u2, "border")
        return jnp.sum(g[:, ::701].astype(jnp.float32))
    ms = _measure(bil_fwd, latent, uv)
    record("a. 4-corner per-corner takes (current)", ms, useful_mb)

    # shared corner/weight math for the paired variants
    def corners(u):
        x = jnp.clip(_unnormalize(u[..., 0], Wf), 0.0, Wf - 1)
        y = jnp.clip(_unnormalize(u[..., 1], Hf), 0.0, Hf - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = (x - x0).astype(jnp.bfloat16)
        wy1 = (y - y0).astype(jnp.bfloat16)
        return (x0.astype(jnp.int32), y0.astype(jnp.int32), wx1, wy1)

    nbase = (jnp.arange(NV, dtype=jnp.int32) * Hf)[:, None]  # (NV, 1)

    # (b) one flat 1-D gather of 2C-contiguous spans per y-row
    def paired_flat(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        x0, y0, wx1, wy1 = corners(u2)
        pad = jnp.zeros((NV, Hf, 1, Cf), lat.dtype)
        flat = jnp.concatenate([lat, pad], axis=2).reshape(-1)  # 1-D
        Wp = Wf + 1

        def span_rows(yy):
            start = ((nbase + yy) * Wp + x0) * Cf  # (NV, P)
            g = jax.lax.gather(
                flat, start.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(2 * Cf,), mode="clip")
            return g.reshape(NV, P, 2, Cf)

        y1 = jnp.minimum(y0 + 1, Hf - 1)
        g0 = span_rows(y0)
        g1 = span_rows(y1)
        wx = jnp.stack([1.0 - wx1, wx1], axis=-1)[..., None]  # (NV,P,2,1)
        out = ((g0 * (1.0 - wy1)[..., None, None]
                + g1 * wy1[..., None, None]) * wx).sum(axis=2)
        return jnp.sum(out[:, ::701].astype(jnp.float32))
    ms = _measure(paired_flat, latent, uv)
    record("b. x-paired corners, flat 1-D span gather", ms, useful_mb)

    # (c) x-paired corners via parity-concatenated (R, 2C) row table
    def paired_parity(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        x0, y0, wx1, wy1 = corners(u2)
        pad = jnp.zeros((NV, Hf, 2, Cf), lat.dtype)
        xp = jnp.concatenate([lat, pad], axis=2)  # (NV, Hf, Wf+2, Cf)
        Wp = Wf + 2
        even = xp.reshape(NV * Hf * (Wp // 2), 2 * Cf)
        odd = xp[:, :, 1:Wp - 1, :].reshape(NV * Hf * ((Wp - 2) // 2),
                                            2 * Cf)
        table = jnp.concatenate([even, odd], axis=0)
        n_even = NV * Hf * (Wp // 2)
        half_odd = (Wp - 2) // 2

        def row_idx(yy):
            par = x0 % 2
            base = nbase + yy
            idx_e = base * (Wp // 2) + x0 // 2
            idx_o = n_even + base * half_odd + (x0 - 1) // 2
            return jnp.where(par == 0, idx_e, idx_o)

        y1 = jnp.minimum(y0 + 1, Hf - 1)
        g0 = table[row_idx(y0).reshape(-1)].reshape(NV, P, 2, Cf)
        g1 = table[row_idx(y1).reshape(-1)].reshape(NV, P, 2, Cf)
        wx = jnp.stack([1.0 - wx1, wx1], axis=-1)[..., None]
        out = ((g0 * (1.0 - wy1)[..., None, None]
                + g1 * wy1[..., None, None]) * wx).sum(axis=2)
        return jnp.sum(out[:, ::701].astype(jnp.float32))
    ms = _measure(paired_parity, latent, uv)
    record("c. x-paired corners, parity row table", ms, useful_mb)

    # raw width-1024 take roof (is the per-row rate flat from 512 -> 1024?)
    t1024 = jnp.asarray(rng.standard_normal((NV * Hf * 193, 1024)),
                        jnp.bfloat16)
    idx_t = jnp.asarray(rng.integers(0, NV * Hf * 193, 163_840), jnp.int32)

    def take1024(c, t, i):
        g = t[(i + c) % (NV * Hf * 193)]
        return jnp.sum(g[::1024].astype(jnp.float32))
    ms = _measure(take1024, t1024, idx_t)
    record("raw flat take, 163.8k idx, C=1024 bf16", ms,
           163_840 * 2048 / 1e6)

    # (d) Pallas per-row DMA gather
    from diner_tpu.ops.pallas.gather_pallas import pallas_row_gather
    t512 = jnp.asarray(rng.standard_normal((NV * Hf * Wf, 512)),
                       jnp.bfloat16)
    idx5 = jnp.asarray(rng.integers(0, NV * Hf * Wf, 163_840), jnp.int32)

    def xla512(c, t, i):
        g = t[(i + c) % (NV * Hf * Wf)]
        return jnp.sum(g[::1024].astype(jnp.float32))
    ms = _measure(xla512, t512, idx5)
    record("raw flat take, 163.8k idx, C=512 bf16", ms, 163_840 * 1024 / 1e6)

    for blk, depth in ((2048, 16), (4096, 32)):
        def pg512(c, t, i):
            g = pallas_row_gather(t, (i + c) % (NV * Hf * Wf),
                                  blk=blk, depth=depth)
            return jnp.sum(g[::1024].astype(jnp.float32))
        try:
            ms = _measure(pg512, t512, idx5)
            record(f"d. pallas DMA row gather C=512 (blk={blk}, d={depth})",
                   ms, 163_840 * 1024 / 1e6)
        except Exception as e:  # noqa: BLE001
            record(f"d. pallas DMA row gather C=512 (blk={blk}, d={depth})",
                   float("nan"), 0, {"error": str(e)[:200]})

    def pg1024(c, t, i):
        g = pallas_row_gather(t, (i + c) % (NV * Hf * 193),
                              blk=2048, depth=16)
        return jnp.sum(g[::1024].astype(jnp.float32))
    try:
        ms = _measure(pg1024, t1024, idx_t)
        record("d. pallas DMA row gather C=1024 (blk=2048, d=16)", ms,
               163_840 * 2048 / 1e6)
    except Exception as e:  # noqa: BLE001
        record("d. pallas DMA row gather C=1024", float("nan"), 0,
               {"error": str(e)[:200]})

    # ------------------------------------------------------- sampler shape
    # (f) Mosaic requires 128-lane-aligned row slices: the C=5 f32 map rows
    # must be padded to C=128 for per-row DMA (25.6x the bytes). Measure at
    # 1/8 the index count and scale; the point is the DMA issue rate.
    N_TABLE = 4 * 512 * 640
    n_idx = 512_000
    t128 = jnp.asarray(rng.standard_normal((N_TABLE, 128)), jnp.float32)
    idx_s = jnp.asarray(rng.integers(0, N_TABLE, n_idx), jnp.int32)

    def xla128(c, t, i):
        g = t[(i + c) % N_TABLE]
        return jnp.sum(g[::1024].astype(jnp.float32))
    ms = _measure(xla128, t128, idx_s)
    record("raw flat take, 512k idx, C=128 f32", ms, n_idx * 512 / 1e6)

    def pg128(c, t, i):
        g = pallas_row_gather(t, (i + c) % N_TABLE, blk=4096, depth=16)
        return jnp.sum(g[::1024].astype(jnp.float32))
    try:
        ms = _measure(pg128, t128, idx_s)
        record("f. pallas DMA row gather 512k idx C=128 f32 (sampler proxy)",
               ms, n_idx * 512 / 1e6,
               {"note": "sampler rows are C=5 f32; lane alignment forces "
                        "128-ch padding => 25.6x bytes; scale ms x8 for "
                        "the full 4.1M-index stage"})
    except Exception as e:  # noqa: BLE001
        record("f. pallas DMA row gather C=128", float("nan"), 0,
               {"error": str(e)[:200]})

    out = {"backend": jax.default_backend(), "reps": REPS, "stages": rows}
    Path("GATHER_LAB.json").write_text(json.dumps(out, indent=2))
    print("\nwrote GATHER_LAB.json")


if __name__ == "__main__":
    main()
