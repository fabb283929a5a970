#!/usr/bin/env python
"""TransMVSNet on-hardware record: short training run + write_prediction.

Runs the reference DTU write_to_dtu.sh configuration (ndepths 48,32,8,
depth_inter_r 4,1,0.5, nviews 4, numdepth 192 — `deps/TransMVSNet/scripts/
write_to_dtu.sh:23-26`) against a DTU-protocol scan (see
``scripts/make_dtu_fixture.py``), at a requested resolution (top-left crop
of the prepared 512x640 sample; a crop keeps intrinsics exact).

Prints JSON lines: per-step train times (honest host sync — the loss scalar
is transferred every step), then the write_prediction per-sample time, then
a round-trip check of the produced uint16 artifacts through
``diner_tpu.data.dtu.load_depths`` semantics.

Usage:
    python scripts/bench_mvs_tpu.py --trainpath /tmp/dtu_fix \
        --trainlist /tmp/dtu_fix/list.txt --hw 256,320 --steps 6
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import (  # noqa: E402
    enable_compilation_cache,
    respect_env_platform,
)
respect_env_platform()
enable_compilation_cache()

_CROPS = {"stage1": 4, "stage2": 2, "stage3": 1}


class CroppedDTU:
    """Top-left crop of MVSDTUDataset samples (keeps intrinsics exact)."""

    def __init__(self, inner, H, W):
        self.inner = inner
        self.H, self.W = H, W

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, i):
        s = dict(self.inner[i])
        H, W = self.H, self.W
        s["imgs"] = np.ascontiguousarray(s["imgs"][:, :H, :W])
        for key in ("depth", "mask"):
            if key in s and isinstance(s[key], dict):
                s[key] = {k: np.ascontiguousarray(
                    v[: H // _CROPS[k], : W // _CROPS[k]])
                    for k, v in s[key].items()}
        return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainpath", required=True)
    ap.add_argument("--trainlist", required=True)
    ap.add_argument("--hw", default="256,320",
                    help="crop H,W (multiples of 32); 512,640 = full DTU")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--outpath", default="/tmp/mvs_pred")
    ap.add_argument("--skip-write", action="store_true")
    ap.add_argument("--sweep-chunk", type=int, default=8)
    ap.add_argument("--remat-mode", default="full",
                    choices=["full", "selective"],
                    help="'selective' keeps FeatureNet activations "
                         "resident (VERDICT r4 item 5)")
    args = ap.parse_args()

    import jax

    from diner_tpu.data.loader import collate
    from diner_tpu.mvs.datasets import MVSDTUDataset
    from diner_tpu.mvs.model import TransMVSNetConfig
    from diner_tpu.mvs.train import (
        MVSTrainConfig,
        create_mvs_state,
        make_mvs_train_step,
        write_prediction,
    )

    H, W = (int(x) for x in args.hw.split(","))
    cfg = MVSTrainConfig(
        model=TransMVSNetConfig(ndepths=(48, 32, 8),
                                depth_intervals_ratio=(4.0, 1.0, 0.5),
                                remat=True,
                                remat_feature=args.remat_mode == "full",
                                sweep_chunk=args.sweep_chunk),
        compute_dtype=args.dtype)

    train_ds = CroppedDTU(MVSDTUDataset(
        args.trainpath, args.trainlist, "train", nviews=4,
        ndepths=args.numdepth), H, W)

    def to_batch(sample):
        b = collate([sample])
        return {k: v for k, v in b.items()
                if not isinstance(v, (list, np.float32, float))}

    example = to_batch(train_ds[0])
    model, state, tx = create_mvs_state(cfg, jax.random.PRNGKey(0), example)
    step_fn = jax.jit(make_mvs_train_step(model, cfg, tx))

    times = []
    for i in range(args.steps):
        batch = to_batch(train_ds[i % len(train_ds)])
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        loss = float(metrics["loss"])  # honest sync: host transfer
        times.append(time.perf_counter() - t0)
        print(json.dumps({"step": i, "loss": round(loss, 4),
                          "ms": round(times[-1] * 1e3, 1)}), flush=True)
    steady = times[1:] if len(times) > 1 else times
    print(json.dumps({"metric": f"mvs_train_step_{H}x{W}_4view_48-32-8",
                      "ms_per_step_steady": round(
                          1e3 * sum(steady) / len(steady), 1)}), flush=True)

    if args.skip_write:
        return
    # ---- write_prediction (val split, light 3) + round-trip ----
    # inference has no backward: run the REAL protocol resolution (512x640)
    val_ds = MVSDTUDataset(args.trainpath, args.trainlist, "val", nviews=4,
                           ndepths=args.numdepth)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    t0 = time.perf_counter()
    out = write_prediction(model, variables, val_ds, args.outpath)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "write_prediction",
                      "n": len(out),
                      "ms_per_sample": round(1e3 * dt / max(len(out), 1), 1),
                      "outpath": str(args.outpath)}), flush=True)

    # round-trip the uint16 protocol exactly as data/dtu.py consumes it
    from diner_tpu.data.dtu import DTU_SCALE_FACTOR
    from diner_tpu.data.io import read_depth_png
    pngs = sorted(Path(args.outpath).rglob("depth_map_*TransMVSNet.png"))
    assert pngs, f"no depth artifacts under {args.outpath}"
    d = read_depth_png(pngs[0]) / DTU_SCALE_FACTOR  # data/dtu.py:110-112
    assert d.shape == (512, 640), d.shape  # the loader's protocol assert
    print(json.dumps({"roundtrip_file": str(pngs[0]),
                      "shape": list(d.shape),
                      "depth_range_mm": [float(d.min()), float(d.max())]}),
          flush=True)


if __name__ == "__main__":
    main()
