#!/usr/bin/env python
"""TransMVSNet driver (train / write_prediction).

Mirrors the reference ``deps/TransMVSNet/train.py`` CLI surface:

    python scripts/mvs_train.py --mode train --trainpath data/DTU \
        --trainlist lists/train.txt --ndepths 48,32,8 --epochs 16
    python scripts/mvs_train.py --mode write_prediction --ckpt <dir> \
        --trainpath data/DTU --trainlist lists/all.txt --outpath data/DTU

write_prediction emits the uint16 ``depth_map_XXXX_TransMVSNet(.png|_conf|_vis)``
protocol DINER's data layer consumes.
"""

import argparse
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
    ap.add_argument("--mode", default="train",
                    choices=["train", "val", "write_prediction", "profile"])
    ap.add_argument("--dataset", default="dtu_yao",
                    choices=["dtu_yao", "facescape", "multiface", "bld"],
                    help="dataset loader (reference train.py --dataset)")
    ap.add_argument("--trainpath", required=True)
    ap.add_argument("--trainlist", default=None,
                    help="scan list (dtu_yao/bld) — see "
                         "diner_tpu/data/splits/mvs/")
    ap.add_argument("--split_dir", default=None,
                    help="facescape/multiface DINER split directory")
    ap.add_argument("--split_config", default=None,
                    help="multiface split json")
    ap.add_argument("--vallist", default=None)
    ap.add_argument("--ndepths", default="48,32,8")
    ap.add_argument("--depth_inter_r", default="4,2,1")
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--interval_scale", type=float, default=1.06)
    ap.add_argument("--nviews", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--logdir", default="outputs/mvs")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--outpath", default=None)
    ap.add_argument("--maskoutput", action="store_true")
    ap.add_argument("--max-steps", type=int, default=-1)
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: error at the first NaN op")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="activation/matmul compute dtype (params stay f32)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize FeatureNet / plane-sweep / 3D-UNet "
                         "activations (needed to fit the 512x640 DTU "
                         "training graph in 16 GB HBM)")
    ap.add_argument("--remat-mode", default="full",
                    choices=["full", "selective"],
                    help="with --remat: 'selective' keeps FeatureNet "
                         "activations resident (no 2.1 s re-forward of the "
                         "step-dominant stage) and remats only the "
                         "plane-sweep + CostRegNet volumes")
    args = ap.parse_args()

    if args.debug_nans:
        import jax as _jax
        _jax.config.update("jax_debug_nans", True)

    import jax
    import numpy as np

    from diner_tpu.data.loader import DataLoader
    from diner_tpu.mvs.datasets import MVSDTUDataset
    from diner_tpu.mvs.model import TransMVSNetConfig
    from diner_tpu.mvs.train import (
        MVSTrainConfig,
        create_mvs_state,
        make_mvs_train_step,
        write_prediction,
    )
    from diner_tpu.train import checkpoint as ckpt_lib

    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    ratios = tuple(float(x) for x in args.depth_inter_r.split(","))
    cfg = MVSTrainConfig(
        model=TransMVSNetConfig(ndepths=ndepths,
                                depth_intervals_ratio=ratios,
                                remat=args.remat,
                                remat_feature=args.remat_mode == "full"),
        lr=args.lr,
        compute_dtype=args.dtype)

    mode = "train" if args.mode == "train" else "val"
    if args.dataset == "dtu_yao":
        assert args.trainlist, "--trainlist required for dtu_yao"
        dataset = MVSDTUDataset(args.trainpath, args.trainlist, mode,
                                nviews=args.nviews, ndepths=args.numdepth,
                                interval_scale=args.interval_scale)
    elif args.dataset == "facescape":
        from diner_tpu.mvs.facescape_dataset import MVSFacescapeDataset
        dataset = MVSFacescapeDataset(
            args.trainpath, args.mode, nviews=args.nviews,
            ndepths=args.numdepth,
            **({"split_dir": args.split_dir} if args.split_dir else {}))
    elif args.dataset == "multiface":
        from diner_tpu.mvs.multiface_dataset import MVSMultifaceDataset
        dataset = MVSMultifaceDataset(
            args.trainpath, args.mode, nviews=args.nviews,
            ndepths=args.numdepth, split_config=args.split_config,
            meta_dir=args.split_dir)
    else:  # bld
        assert args.trainlist, "--trainlist required for bld"
        from diner_tpu.mvs.eval_datasets import MVSBlendedDataset
        dataset = MVSBlendedDataset(args.trainpath, args.trainlist, mode,
                                    nviews=args.nviews,
                                    ndepths=args.numdepth)

    def to_batch(sample_or_batch):
        import jax.numpy as jnp
        out = {}
        for k, v in sample_or_batch.items():
            if isinstance(v, dict):
                out[k] = {kk: jnp.asarray(vv) for kk, vv in v.items()}
            elif isinstance(v, np.ndarray):
                out[k] = jnp.asarray(v)
        return out

    example = to_batch(next(iter(DataLoader(dataset, args.batch_size,
                                            num_workers=0))))
    model, state, tx = create_mvs_state(cfg, jax.random.PRNGKey(0), example)
    ckpt_dir = Path(args.logdir) / "checkpoints"
    if args.ckpt:
        state = ckpt_lib.restore_checkpoint(args.ckpt, state)
    elif (latest := ckpt_lib.latest_checkpoint(ckpt_dir)):
        state = ckpt_lib.restore_checkpoint(latest, state)

    if args.mode == "write_prediction":
        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        out = write_prediction(model, variables, dataset,
                               args.outpath or args.trainpath,
                               mask_output=args.maskoutput)
        print(f"wrote {len(out)} depth maps")
        return

    step_fn = jax.jit(make_mvs_train_step(model, cfg, tx))

    if args.mode == "profile":
        # reference train.py:321-349: warm up, then trace 5 steps to a
        # chrome-trace; TPU equivalent is a jax.profiler trace directory
        # loadable in TensorBoard / Perfetto.
        from diner_tpu.utils.profiling import trace
        trace_dir = str(Path(args.logdir) / "trace")
        state, _ = step_fn(state, example)  # warmup/compile
        with trace(trace_dir):
            for i in range(5):
                state, metrics = step_fn(state, example)
                jax.device_get(metrics["loss"])
        print(f"wrote profiler trace to {trace_dir}")
        return

    if args.mode == "val":
        # reference train.py:269-319 (test_sample_depth): depth metrics
        # over the val set, dict-averaged
        import jax.numpy as jnp
        from diner_tpu.mvs.loss import abs_depth_error, threshold_metric
        from diner_tpu.utils.meters import DictAverageMeter

        variables = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}

        @jax.jit
        def val_metrics(imgs, projs, dvals, gt, mask):
            out = model.apply(variables, imgs, projs, dvals, False)
            d = out["depth"]
            return {
                "abs_depth_error": abs_depth_error(d, gt, mask),
                "thres2mm_error": threshold_metric(d, gt, mask, 2.0),
                "thres4mm_error": threshold_metric(d, gt, mask, 4.0),
                "thres8mm_error": threshold_metric(d, gt, mask, 8.0),
            }

        meter = DictAverageMeter()
        n = len(dataset) if args.max_steps < 0 else min(len(dataset),
                                                        args.max_steps)
        for i in range(n):
            b = to_batch(dataset[i])
            m = val_metrics(b["imgs"][None],
                            {k: v[None] for k, v in b["proj_matrices"].items()},
                            b["depth_values"][None],
                            b["depth"]["stage3"][None],
                            b["mask"]["stage3"][None])
            meter.update({k: float(v) for k, v in m.items()})
        for k, v in meter.mean().items():
            print(f"{k}: {v:.4f}")
        return

    loader = DataLoader(dataset, args.batch_size, shuffle=True,
                        num_workers=2)
    step = int(state["step"])
    for epoch in range(args.epochs):
        for batch in loader:
            if 0 <= args.max_steps <= step:
                break
            t0 = time.time()
            state, metrics = step_fn(state, to_batch(batch))
            step = int(state["step"])
            if step % 50 == 0 or 0 <= args.max_steps <= 50:
                print(f"epoch {epoch} step {step} "
                      f"loss {float(metrics['loss']):.4f} "
                      f"({time.time() - t0:.2f}s/it)", flush=True)
        ckpt_lib.save_checkpoint(ckpt_dir, state, step=int(state["step"]))
    print("done")


if __name__ == "__main__":
    main()
