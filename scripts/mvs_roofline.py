#!/usr/bin/env python
"""Per-stage attribution of the full-res TransMVSNet training step.

VERDICT r3 item 3: the 512x640 / 4-view / 48-32-8 training step runs at
~23.3 s (BENCH.md) with no attribution. This script times every piece at
the exact ``write_to_dtu.sh:23-26`` production shape (bf16, remat as in
production) plus a remat on/off ablation at 256x320 (which fits both
ways):

  - FeatureNet fwd / fwd+bwd on (4, 512, 640, 3)   [incl. DCN heads]
  - FMT pathway fwd / fwd+bwd
  - per cascade stage: DepthNet (plane-sweep warp + PixelwiseNet +
    CostRegNet + WTA) fwd / fwd+bwd at its stage shape
  -   sub-split: homo_warping-only and CostRegNet-only per stage
  - loss + full train step (cross-checks bench_mvs_tpu's 23.3 s)
  - remat=True vs remat=False full step at 256x320

Writes MVS_ROOFLINE_r04.json. Run:  python -u scripts/mvs_roofline.py
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
B, V, H, W = 1, 4, 512, 640
NDEPTHS = (48, 32, 8)
BC = 8


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]).astype(jnp.float32))


def _time(fn, *args, iters=3):
    """Warm + min-of-iters with honest host sync; inputs perturbed per
    call via a scalar argument so the relay result cache cannot serve."""
    z = jnp.zeros((), jnp.float32)
    compiled = jax.jit(fn).lower(z, *args).compile()
    _sync(compiled(z, *args))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _sync(compiled(jnp.asarray(float(i + 1)), *args))
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3


def make_proj(scale_h, scale_w):
    intr = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]],
                    np.float32)
    P = np.zeros((B, V, 2, 4, 4), np.float32)
    for v in range(V):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.06 * v
        P[:, v, 0] = E
        K = intr.copy()
        K[0] *= scale_w
        K[1] *= scale_h
        P[:, v, 1, :3, :3] = K
    return jnp.asarray(P)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    rows = []

    def record(name, ms, extra=None):
        row = dict(stage=name, ms=round(ms, 1))
        if extra:
            row.update(extra)
        rows.append(row)
        print(json.dumps(row), flush=True)

    from diner_tpu.mvs.model import (
        CostRegNet, DepthNet, FeatureNet, TransMVSNet, TransMVSNetConfig)
    from diner_tpu.mvs.fmt import FMTWithPathway
    from diner_tpu.mvs.homography import homo_warping

    imgs = jnp.asarray(rng.uniform(0, 1, (B * V, H, W, 3)), jnp.float32)

    # ------------------------------------------------------ FeatureNet
    feat = FeatureNet(BC, dtype=DT)
    fvars = feat.init(jax.random.PRNGKey(0), imgs, False)

    def feat_fwd(i, v, x):
        out = feat.apply(v, x + i * 1e-6, False)
        return sum(jnp.sum(o[..., ::4].astype(jnp.float32))
                   for o in out.values())
    record("FeatureNet fwd (4x512x640, DCN heads)",
           _time(feat_fwd, fvars, imgs))

    def feat_fwdbwd(i, v, x):
        def f(p):
            out = feat.apply({"params": p,
                              "batch_stats": v["batch_stats"]},
                             x + i * 1e-6, False)
            return sum(jnp.sum(o[..., ::4].astype(jnp.float32))
                       for o in out.values())
        val, g = jax.value_and_grad(f)(v["params"])
        return val + _leaf0(g)
    record("FeatureNet fwd+bwd", _time(feat_fwdbwd, fvars, imgs))

    # ------------------------------------------------------------- FMT
    feats_all = feat.apply(fvars, imgs, False)
    features = [
        {k: f.reshape((B, V) + f.shape[1:])[:, v]
         for k, f in feats_all.items()} for v in range(V)]
    fmt = FMTWithPathway(BC, pe_type="sine", dtype=DT)
    mvars = fmt.init(jax.random.PRNGKey(0), features)

    def fmt_fwd(i, v, fs):
        fs = jax.tree_util.tree_map(lambda a: a + (i * 1e-6).astype(a.dtype), fs)
        out = fmt.apply(v, fs)
        return sum(jnp.sum(o["stage1"][..., ::4].astype(jnp.float32))
                   for o in out)
    record("FMT pathway fwd", _time(fmt_fwd, mvars, features))

    def fmt_fwdbwd(i, v, fs):
        def f(fs2):
            out = fmt.apply(v, fs2)
            return sum(jnp.sum(o["stage1"][..., ::4].astype(jnp.float32))
                       for o in out)
        fs = jax.tree_util.tree_map(lambda a: a + (i * 1e-6).astype(a.dtype), fs)
        val, g = jax.value_and_grad(f)(fs)
        return val + _leaf0(g)
    record("FMT pathway fwd+bwd", _time(fmt_fwdbwd, mvars, features))

    fmt_features = fmt.apply(mvars, features)

    # -------------------------------------------------- cascade stages
    class StageProbe(nn.Module):
        cr_ch: int
        remat: bool = True

        @nn.compact
        def __call__(self, feats, projs, dv, view_weights,
                     train: bool = False):
            cost_cls = (nn.remat(CostRegNet, static_argnums=(2,))
                        if self.remat else CostRegNet)
            cost = cost_cls(self.cr_ch, dtype=DT, name="cost")
            dn = DepthNet(dtype=DT, remat=self.remat, sweep_chunk=8,
                          name="dn")
            return dn(feats, projs, dv, cost,
                      view_weights=view_weights, train=train)

    stage_meta = []
    for si, D in enumerate(NDEPTHS):
        scale = 2 ** (len(NDEPTHS) - 1 - si)
        h, w = H // scale, W // scale
        sk = f"stage{si + 1}"
        feats = [f[sk] for f in fmt_features]
        projs = make_proj(1.0 / scale, 1.0 / scale)
        dv = jnp.asarray(
            rng.uniform(400, 900, (B, D, h, w)), jnp.float32)
        vw = (None if si == 0 else jnp.asarray(
            rng.uniform(0.3, 1.0, (B, V - 1, h, w)), jnp.float32))
        probe = StageProbe(cr_ch=8)
        pvars = probe.init(jax.random.PRNGKey(si), feats, projs, dv, vw,
                           False)
        stage_meta.append((sk, feats, projs, dv, vw, probe, pvars, h, w, D))

        def st_fwd(i, v, fs, dvv, vww, probe=probe, projs=projs):
            fs = [a + (i * 1e-6).astype(a.dtype) for a in fs]
            out, w2 = probe.apply(v, fs, projs, dvv, vww, False)
            return jnp.sum(out["depth"][..., ::7].astype(jnp.float32))
        record(f"{sk} DepthNet fwd (D={D}, {h}x{w})",
               _time(st_fwd, pvars, feats, dv, vw))

        def st_fwdbwd(i, v, fs, dvv, vww, probe=probe, projs=projs):
            def f(fs2):
                out, _ = probe.apply(v, fs2, projs, dvv, vww, False)
                return jnp.sum(out["depth"][..., ::7].astype(jnp.float32))
            fs = [a + (i * 1e-6).astype(a.dtype) for a in fs]
            val, g = jax.value_and_grad(f)(fs)
            return val + _leaf0(g)
        record(f"{sk} DepthNet fwd+bwd",
               _time(st_fwdbwd, pvars, feats, dv, vw))

        # sub-split: warp-only (all V-1 source views, scan-chunked like
        # production would if it used one big call — here unchunked per
        # 8-plane group for the gather cost alone)
        def warp_only(i, fs, dvv, projs=projs, h=h, w=w, D=D):
            def full_proj(pm):
                ext = pm[:, 0]
                out = ext.at[:, :3, :4].set(
                    jnp.einsum("bij,bjk->bik", pm[:, 1, :3, :3],
                               ext[:, :3, :4], precision="highest"))
                return out
            rp = full_proj(projs[:, 0])
            acc = 0.0
            for vv in range(1, V):
                sp = full_proj(projs[:, vv])
                wf = homo_warping(fs[vv] + (i * 1e-6).astype(fs[vv].dtype), sp, rp,
                                  dvv.reshape(B, D, h * w))
                acc = acc + jnp.sum(wf[..., ::5].astype(jnp.float32))
            return acc
        record(f"{sk} homo_warping only (3 src views, D={D})",
               _time(warp_only, feats, dv))

        # sub-split: CostRegNet only
        cost = CostRegNet(8, dtype=DT)
        vol = jnp.asarray(rng.standard_normal((B, D, h, w)), DT)
        cvars = cost.init(jax.random.PRNGKey(1), vol, False)

        def cost_fwd(i, v, x, cost=cost):
            return jnp.sum(cost.apply(v, x + (i * 1e-6).astype(DT),
                                      False)[..., ::7]
                           .astype(jnp.float32))
        record(f"{sk} CostRegNet fwd (D={D}, {h}x{w})",
               _time(cost_fwd, cvars, vol))

        def cost_fwdbwd(i, v, x, cost=cost):
            def f(x2):
                return jnp.sum(cost.apply(v, x2, False)[..., ::7]
                               .astype(jnp.float32))
            val, g = jax.value_and_grad(f)(x + (i * 1e-6).astype(DT))
            return val + jnp.sum(g[..., ::11].astype(jnp.float32))
        record(f"{sk} CostRegNet fwd+bwd", _time(cost_fwdbwd, cvars, vol))

    # --------------------------------------- full model + train step
    from diner_tpu.mvs.train import (
        MVSTrainConfig, create_mvs_state, make_mvs_train_step)

    def full_batch(h, w):
        proj = {f"stage{si + 1}": make_proj(
            (2.0 ** -(len(NDEPTHS) - 1 - si)) * h / H,
            (2.0 ** -(len(NDEPTHS) - 1 - si)) * w / W)
            for si in range(len(NDEPTHS))}
        batch = {
            "imgs": jnp.asarray(rng.uniform(0, 1, (B, V, h, w, 3)),
                                jnp.float32),
            "proj_matrices": proj,
            "depth_values": jnp.asarray(
                np.linspace(425, 935, 192)[None].repeat(B, 0),
                jnp.float32),
            "depth": {f"stage{si + 1}": jnp.asarray(
                rng.uniform(425, 935,
                            (B, h // 2 ** (len(NDEPTHS) - 1 - si),
                             w // 2 ** (len(NDEPTHS) - 1 - si))),
                jnp.float32) for si in range(len(NDEPTHS))},
            "mask": {f"stage{si + 1}": jnp.ones(
                (B, h // 2 ** (len(NDEPTHS) - 1 - si),
                 w // 2 ** (len(NDEPTHS) - 1 - si)), jnp.float32)
                for si in range(len(NDEPTHS))},
        }
        return batch

    for (h, w, remat, tag) in ((H, W, True, "512x640 remat"),
                               (256, 320, True, "256x320 remat"),
                               (256, 320, False, "256x320 NO remat")):
        cfg = MVSTrainConfig(
            model=TransMVSNetConfig(ndepths=NDEPTHS,
                                    depth_intervals_ratio=(4.0, 1.0, 0.5),
                                    remat=remat, sweep_chunk=8),
            compute_dtype="bfloat16")
        batch = full_batch(h, w)
        try:
            model, state, tx = create_mvs_state(cfg, jax.random.PRNGKey(0),
                                                batch)
            step_fn = jax.jit(make_mvs_train_step(model, cfg, tx))
            state, m = step_fn(state, batch)
            _sync(m["loss"])
            times = []
            for i in range(2 if h == H else 3):
                b2 = dict(batch)
                b2["imgs"] = batch["imgs"] + (i + 1) * 1e-5
                t0 = time.perf_counter()
                state, m = step_fn(state, b2)
                _sync(m["loss"])
                times.append(time.perf_counter() - t0)
            record(f"FULL train step {tag}", min(times) * 1e3)
        except Exception as e:  # noqa: BLE001
            record(f"FULL train step {tag}", float("nan"),
                   {"error": str(e)[:200]})

    out = {"backend": jax.default_backend(), "shape": [B, V, H, W],
           "ndepths": list(NDEPTHS), "dtype": "bfloat16",
           "stages": rows}
    Path("MVS_ROOFLINE_r04.json").write_text(json.dumps(out, indent=2))
    print("\nwrote MVS_ROOFLINE_r04.json")


def _leaf0(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves[:3])


if __name__ == "__main__":
    main()
