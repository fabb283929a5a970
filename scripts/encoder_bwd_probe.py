#!/usr/bin/env python
"""Chase the encoder backward (VERDICT r2 item 8): 49 ms measured fwd+bwd
vs ~16 ms ideal hand count at the flagship shape (4 x 512x640 + 64 px ring,
resnet34, bf16).

Experiment matrix, all amortized in-graph (REPS-step scan, one host sync):
  - fwd and fwd+bwd at num_layers = 1..4  → per-stage attribution;
  - train-mode BN (reference-faithful: batch stats + extra passes)
    vs frozen BN (running averages; single fused pass) — the reference's
    DDP never synced encoder BN either, so frozen BN is a defensible
    deployment mode;
  - bf16 vs f32 activations.

Writes ENCODER_BWD.json. Run: python -u scripts/encoder_bwd_probe.py
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

REPS = 8


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def measure(fn, carry0, *consts, reps=REPS, iters=3):
    def chain(c, *k):
        def body(c, _):
            return fn(c, *k), ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    t0 = time.perf_counter()
    compiled = jax.jit(chain).lower(carry0, *consts).compile()
    cs = time.perf_counter() - t0
    c = compiled(carry0, *consts)
    _sync(c)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        c = compiled(c, *consts)
        _sync(c)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3 / reps, cs


def main():
    from diner_tpu.models.pixelnerf import PixelNeRF, PixelNeRFConfig
    from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
    from diner_tpu.data.synthetic import make_sphere_scene

    print(f"backend={jax.default_backend()}", flush=True)
    batch = make_sphere_scene(H=512, W=640, nv=4)
    rows = []

    def run_case(tag, num_layers, dtype, train_bn):
        cfg = PixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet34",
                                         num_layers=num_layers,
                                         image_padding=64, padding_pe=4),
            d_hidden=512, compute_dtype=dtype)
        model = PixelNeRF(cfg=cfg)
        variables = model.init(
            jax.random.PRNGKey(0), batch["src_rgbs"], batch["src_depths"],
            batch["src_depth_stds"], batch["src_extrinsics"],
            batch["src_intrinsics"], train=True, method="encode")
        params = variables["params"]
        bstats = variables.get("batch_stats", {})

        def encode(p):
            v = {"params": p, "batch_stats": bstats}
            if train_bn:
                ctx, _ = model.apply(
                    v, batch["src_rgbs"], batch["src_depths"],
                    batch["src_depth_stds"], batch["src_extrinsics"],
                    batch["src_intrinsics"], train=True, method="encode",
                    mutable=["batch_stats"])
            else:
                ctx = model.apply(
                    v, batch["src_rgbs"], batch["src_depths"],
                    batch["src_depth_stds"], batch["src_extrinsics"],
                    batch["src_intrinsics"], train=False, method="encode")
            return ctx

        def perturb(p, c):
            return jax.tree_util.tree_map(
                lambda t: (t + c * jnp.zeros((), t.dtype)).astype(t.dtype)
                if jnp.issubdtype(t.dtype, jnp.floating) else t, p)

        def fwd(c, p):
            ctx = encode(perturb(p, c))
            return jnp.sum(ctx.latent[0, 0, 0, 0, :8].astype(jnp.float32))

        def fwdbwd(c, p):
            def loss(pp):
                ctx = encode(pp)
                return jnp.mean(jnp.square(ctx.latent.astype(jnp.float32)))
            val, g = jax.value_and_grad(loss)(perturb(p, c))
            leaf = jax.tree_util.tree_leaves(g)[0]
            return val + jnp.sum(leaf.astype(jnp.float32)) * 1e-9

        ms_f, cs1 = measure(fwd, jnp.zeros(()), params)
        ms_fb, cs2 = measure(fwdbwd, jnp.zeros(()), params)
        row = dict(case=tag, num_layers=num_layers, dtype=dtype,
                   train_bn=train_bn, fwd_ms=round(ms_f, 2),
                   fwdbwd_ms=round(ms_fb, 2),
                   bwd_ms=round(ms_fb - ms_f, 2),
                   compile_s=round(cs1 + cs2, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

    # per-stage attribution at the baseline recipe
    for nl in (1, 2, 3, 4):
        run_case(f"baseline nl={nl}", nl, "bfloat16", True)
    # frozen BN at full depth
    run_case("frozen-BN", 4, "bfloat16", False)
    # f32 comparison at full depth
    run_case("f32 train-BN", 4, "float32", True)

    Path("ENCODER_BWD.json").write_text(json.dumps(
        {"backend": jax.default_backend(),
         "shape": "4x512x640 + 64px ring, resnet34",
         "reps": REPS, "cases": rows}, indent=2))
    print("wrote ENCODER_BWD.json", flush=True)


if __name__ == "__main__":
    main()
