#!/usr/bin/env python
"""A/B the hand-written DCN sampler VJP at the full-res FeatureNet shape.

MVS_ROOFLINE_r04 attributed ~16.2 s of the 23.3 s full-res MVS training
step to FeatureNet fwd+bwd (the DCN heads' autodiff backward lane-pads
its C<=32 scatters x(128/C)). This probe times FeatureNet fwd and
fwd+bwd with the custom channels-major VJP (current code) — compare
against the "before" rows in MVS_ROOFLINE_r04.json.

Writes DCN_BWD_r04.json. Run:  python -u scripts/dcn_bwd_probe.py
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
B, V, H, W = 1, 4, 512, 640


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


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


def _leaf0(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves[:3])


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    import diner_tpu.mvs.dcn as dcn_mod
    dcn_mod.DCN_CUSTOM_VJP = True  # probe the hand-written VJP
    from diner_tpu.mvs.model import FeatureNet

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B * V, H, W, 3)), jnp.float32)
    feat = FeatureNet(8, dtype=DT)
    fvars = feat.init(jax.random.PRNGKey(0), imgs, False)
    rows = []

    def feat_fwd(i, v, x):
        out = feat.apply(v, x + i * 1e-6, False)
        return sum(jnp.sum(o[..., ::4].astype(jnp.float32))
                   for o in out.values())
    ms = _time(feat_fwd, fvars, imgs)
    rows.append({"stage": "FeatureNet fwd (custom DCN VJP code)",
                 "ms": round(ms, 1)})
    print(json.dumps(rows[-1]), flush=True)

    def feat_fwdbwd(i, v, x):
        def f(p):
            out = feat.apply({"params": p,
                              "batch_stats": v["batch_stats"]},
                             x + i * 1e-6, False)
            return sum(jnp.sum(o[..., ::4].astype(jnp.float32))
                       for o in out.values())
        val, g = jax.value_and_grad(f)(v["params"])
        return val + _leaf0(g)
    ms = _time(feat_fwdbwd, fvars, imgs)
    rows.append({"stage": "FeatureNet fwd+bwd (custom DCN VJP)",
                 "ms": round(ms, 1)})
    print(json.dumps(rows[-1]), flush=True)

    Path("DCN_BWD_r04.json").write_text(json.dumps(
        {"backend": jax.default_backend(), "rows": rows}, indent=2))
    print("wrote DCN_BWD_r04.json")


if __name__ == "__main__":
    main()
