#!/usr/bin/env python
"""Gather lab, part 2: the pair-table field gather as it would ship.

Lab 1 (GATHER_LAB.json) showed raw width-1024 takes reach 68 GB/s vs
43.7 at width-512 — but the naive parity-table variant lost because it
rebuilt the pair table inside the measured step. Here the pair table is
built ONCE (it would live in SceneContext, rebuilt once per encode) and
the measured step is the gather+lerp only, plus the backward variants:

  a. current 4-corner fwd (baseline)
  b. pair-table fwd (prebuilt table)
  c. pair-table build cost alone (amortized once per train step)
  d. current 4-corner bwd scatter (baseline fwd+bwd)
  e. pair-table bwd: 2 wide-row scatters into a pair-layout f32 canvas
     + stream fold back to (NV, H, W, C)
  f. gather with XLA slice_sizes=(2, C) two-row gather (the "fetch both
     y rows in one index" alternative)

Writes GATHER_LAB2.json. Run:  python -u scripts/gather_lab2.py
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
NV, Hf, Wf, Cf = 4, 320, 384, 512
P = 163_840 // NV


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


CE = (Wf + 2) // 2   # even-pair rows per (n, y)
CO = Wf // 2         # odd-pair rows per (n, y)
N_EVEN = NV * Hf * CE


def build_pair_table(lat):
    """(NV, H, W, C) -> parity-concatenated (NV*H*(CE+CO), 2C) pair table."""
    xp = jnp.concatenate(
        [lat, jnp.zeros((NV, Hf, 2, Cf), lat.dtype)], axis=2)
    even = xp.reshape(NV * Hf * CE, 2 * Cf)
    odd = xp[:, :, 1:Wf + 1, :].reshape(NV * Hf * CO, 2 * Cf)
    return jnp.concatenate([even, odd], axis=0)


def pair_row_idx(nbase, yy, x0):
    par = x0 % 2
    base = nbase + yy
    idx_e = base * CE + x0 // 2
    idx_o = N_EVEN + base * CO + (x0 - 1) // 2
    return jnp.where(par == 0, idx_e, idx_o)


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
    latent = jnp.asarray(rng.standard_normal((NV, Hf, Wf, Cf)), jnp.bfloat16)
    uv = jnp.asarray(rng.uniform(-1, 1, (NV, P, 2)), jnp.float32)
    useful_mb = NV * P * Cf * 2 * 4 / 1e6

    from diner_tpu.ops.grid_sample import grid_sample_bilinear, _unnormalize

    def corners(u):
        x = jnp.clip(_unnormalize(u[..., 0], Wf), 0.0, Wf - 1)
        y = jnp.clip(_unnormalize(u[..., 1], Hf), 0.0, Hf - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = (x - x0).astype(jnp.bfloat16)
        wy1 = (y - y0).astype(jnp.bfloat16)
        return (x0.astype(jnp.int32), y0.astype(jnp.int32), wx1, wy1)

    nbase = (jnp.arange(NV, dtype=jnp.int32) * Hf)[:, None]

    # (a) baseline
    def bil_fwd(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        g = grid_sample_bilinear(lat, u2, "border")
        return jnp.sum(g[:, ::701].astype(jnp.float32))
    ms = _measure(bil_fwd, latent, uv)
    record("a. 4-corner fwd (current)", ms, useful_mb)

    # (b) pair-table fwd, table prebuilt
    table = build_pair_table(latent)

    def pair_fwd(c, t, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        x0, y0, wx1, wy1 = corners(u2)
        y1 = jnp.minimum(y0 + 1, Hf - 1)
        g0 = t[pair_row_idx(nbase, y0, x0).reshape(-1)].reshape(
            NV, P, 2, Cf)
        g1 = t[pair_row_idx(nbase, y1, x0).reshape(-1)].reshape(
            NV, P, 2, Cf)
        wx = jnp.stack([1.0 - wx1, wx1], axis=-1)[..., None]
        out = ((g0 * (1.0 - wy1)[..., None, None]
                + g1 * wy1[..., None, None]) * wx).sum(axis=2)
        return jnp.sum(out[:, ::701].astype(jnp.float32))
    ms = _measure(pair_fwd, table, uv)
    record("b. pair-table fwd (prebuilt table)", ms, useful_mb)

    # (c) table build alone
    def build_only(c, lat):
        t = build_pair_table(lat + c.astype(lat.dtype) * jnp.asarray(
            1e-3, lat.dtype))
        return jnp.sum(t[::4097, ::511].astype(jnp.float32))
    ms = _measure(build_only, latent)
    record("c. pair-table build (once per encode)", ms,
           NV * Hf * (Wf + 2 + Wf) * Cf * 2 * 2 / 1e6,
           {"note": "useful = bytes written + read for odd copy + concat"})

    # (d) baseline fwd+bwd
    def bil_fwdbwd(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7

        def f(l):
            g = grid_sample_bilinear(l, u2, "border")
            return jnp.sum(g[:, ::701].astype(jnp.float32))
        val, grad = jax.value_and_grad(f)(lat)
        return val + jnp.sum(grad[:, 0, 0, :4].astype(jnp.float32))
    ms = _measure(bil_fwdbwd, latent, uv)
    record("d. 4-corner fwd+bwd (current)", ms, 2 * useful_mb)

    # (e) pair-table bwd: wide-row scatters + stream fold
    def pair_bwd(c, t, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        x0, y0, wx1, wy1 = corners(u2)
        y1 = jnp.minimum(y0 + 1, Hf - 1)
        # pretend cotangent
        g = (jnp.ones((NV, P, Cf), jnp.bfloat16)
             * (1 + c).astype(jnp.bfloat16))
        wx = jnp.stack([1.0 - wx1, wx1], axis=-1)  # (NV, P, 2)
        acc = jnp.zeros((NV * Hf * (CE + CO), 2 * Cf), jnp.float32)
        for yy, wy in ((y0, (1.0 - wy1)), (y1, wy1)):
            upd = (g * wy[..., None]).astype(jnp.float32)
            upd2 = jnp.concatenate(
                [upd * wx[..., 0:1], upd * wx[..., 1:2]], axis=-1)
            ridx = pair_row_idx(nbase, yy, x0).reshape(-1)
            acc = acc.at[ridx].add(upd2.reshape(-1, 2 * Cf))
        # fold pair canvas back to (NV, H, W, C)
        even = acc[:N_EVEN].reshape(NV, Hf, Wf + 2, Cf)
        odd = acc[N_EVEN:].reshape(NV, Hf, Wf, Cf)
        out = even[:, :, :Wf]
        out = out.at[:, :, 1:].add(odd[:, :, :Wf - 1])
        # (odd pairs starting at Wf-1 land in the pad; border weight 0)
        d_lat = out.astype(jnp.bfloat16)
        return jnp.sum(d_lat[:, ::41, ::41, ::101].astype(jnp.float32))
    ms = _measure(pair_bwd, table, uv)
    record("e. pair-table bwd scatter + fold", ms, 2 * useful_mb)

    # (f) two-row (2, C) slice gather: both y rows in one index
    def tworow(c, lat, u):
        u2 = u + c.astype(jnp.float32) * 1e-7
        x0, y0, wx1, wy1 = corners(u2)
        flat = lat.reshape(NV * Hf, Wf * Cf)  # rows = image rows
        start_r = (nbase + jnp.minimum(y0, Hf - 2)).reshape(-1)
        start_c = (jnp.minimum(x0, Wf - 2) * Cf).reshape(-1)
        g = jax.lax.gather(
            flat, jnp.stack([start_r, start_c], axis=-1),
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2 * Cf), mode="clip")
        return jnp.sum(g[::811].astype(jnp.float32))
    ms = _measure(tworow, latent, uv)
    record("f. (2, 2C) block slice gather", ms, useful_mb)

    out = {"backend": jax.default_backend(), "reps": REPS, "stages": rows}
    Path("GATHER_LAB2.json").write_text(json.dumps(out, indent=2))
    print("\nwrote GATHER_LAB2.json")


if __name__ == "__main__":
    main()
