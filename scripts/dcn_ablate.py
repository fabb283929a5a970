#!/usr/bin/env python
"""Micro-ablation: where does ONE full-res DeformConv2d's backward go?

Times a single DCN (C=32, 4x512x640 — the out3-head shape) under:
  a. fwd only
  b. fwd+bwd, offsets+mask stop_gradient'ed (d_img + d_weight only)
  c. fwd+bwd full (d_offset/d_mask chain included)
  d. b and c with the autodiff reference sampler (no custom VJP)
  e. raw flat-take gather of the same row volume (36 x 1.31M x C=32)

Writes DCN_ABLATE_r04.json. Run:  python -u scripts/dcn_ablate.py
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

DT = jnp.bfloat16
N, H, W, C = 4, 512, 640, 32


def _sync(x):
    return float(jnp.asarray(x, jnp.float32))


def _time(fn, *args, iters=3):
    z = jnp.zeros((), jnp.float32)
    compiled = jax.jit(fn).lower(z, *args).compile()
    _sync(compiled(z, *args))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _sync(compiled(jnp.asarray(float(i + 1)), *args))
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    import diner_tpu.mvs.dcn as dcn_mod
    from diner_tpu.mvs.dcn import DeformConv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), DT)
    dcn = DeformConv2d(C, dtype=DT)
    variables = dcn.init(jax.random.PRNGKey(0), x)
    # non-zero offsets/masks so gathers are real
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.ones_like(a), variables)
    rows = []

    def record(name, ms):
        rows.append({"stage": name, "ms": round(ms, 1)})
        print(json.dumps(rows[-1]), flush=True)

    def with_sampler(use_ref):
        real = dcn_mod.DCN_CUSTOM_VJP
        dcn_mod.DCN_CUSTOM_VJP = not use_ref
        return real

    for use_ref, tag in ((False, "customVJP"), (True, "autodiff")):
        real = with_sampler(use_ref)
        try:
            def fwd(i, v, xx):
                o = dcn.apply(v, xx + (i * 1e-6).astype(DT))
                return jnp.sum(o[..., ::4].astype(jnp.float32))
            record(f"one DCN fwd [{tag}]", _time(fwd, variables, x))

            def fwdbwd(i, v, xx):
                def f(xx2):
                    o = dcn.apply(v, xx2)
                    return jnp.sum(o[..., ::4].astype(jnp.float32))
                val, g = jax.value_and_grad(f)(
                    xx + (i * 1e-6).astype(DT))
                return val + jnp.sum(g[..., :1].astype(jnp.float32))
            record(f"one DCN fwd+bwd d_input [{tag}]",
                   _time(fwdbwd, variables, x))

            def fwdbwd_p(i, v, xx):
                def f(p):
                    o = dcn.apply(p, xx + (i * 1e-6).astype(DT))
                    return jnp.sum(o[..., ::4].astype(jnp.float32))
                val, g = jax.value_and_grad(f)(v)
                l = jax.tree_util.tree_leaves(g)
                return val + sum(jnp.sum(a[..., :1].astype(jnp.float32))
                                 for a in l)
            record(f"one DCN fwd+bwd d_params (incl offset conv) [{tag}]",
                   _time(fwdbwd_p, variables, x))
        finally:
            dcn_mod.DCN_CUSTOM_VJP = real

    # raw roofs at the same volume: 36 gathers x (N*HW) idx, C=32
    table = jnp.asarray(rng.standard_normal((N * H * W, C)), DT)
    idx = jnp.asarray(rng.integers(0, N * H * W, N * H * W), jnp.int32)

    def raw36(i, t, ii):
        acc = 0.0
        for k in range(36):
            g = t[(ii + (i.astype(jnp.int32) * 131 + k * 7919))
                  % (N * H * W)]
            acc = acc + jnp.sum(g[::4097].astype(jnp.float32))
        return acc
    record("raw 36x flat take (1.31M idx, C=32 bf16)",
           _time(raw36, table, idx))

    def rawscat(i, t, ii):
        acc = jnp.zeros((N * H * W, C), jnp.float32)
        upd = (t + (i * 1e-3).astype(DT)).astype(jnp.float32)
        for k in range(8):
            acc = acc.at[(ii + k * 7919) % (N * H * W)].add(upd)
        return jnp.sum(acc[::4097, 0])
    record("raw 8x row scatter-add (1.31M idx, C=32 f32 acc)",
           _time(rawscat, table, idx))

    Path("DCN_ABLATE_r04.json").write_text(json.dumps(
        {"backend": jax.default_backend(), "shape": [N, H, W, C],
         "rows": rows}, indent=2))
    print("wrote DCN_ABLATE_r04.json")


if __name__ == "__main__":
    main()
