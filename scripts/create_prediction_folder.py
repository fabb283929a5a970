#!/usr/bin/env python
"""Render a validation subset and score it.

Mirrors the reference eval driver
(``python_scripts/create_prediction_folder.py:16-62``): loads a checkpoint,
optionally overrides znear/zfar and the sample count (rescaling n_gaussian
proportionally, cf. :49-52), renders the prediction folder, runs the metric
suite.

    python scripts/create_prediction_folder.py --config cfg.yaml \
        --ckpt outputs/run/default/checkpoints/step_00010000 \
        --out /tmp/preds [--nsamples 64] [--n 100]
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import respect_env_platform
respect_env_platform()  # JAX_PLATFORMS=cpu must win over plugin pins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--nsamples", type=int, default=None,
                    help="override renderer n_samples (n_gaussian rescaled)")
    ap.add_argument("--n", type=int, default=-1,
                    help="number of val samples to render (-1 = all)")
    ap.add_argument("--znear", type=float, default=None)
    ap.add_argument("--zfar", type=float, default=None)
    ap.add_argument("--model", default="DINER")
    args = ap.parse_args()

    import jax

    from diner_tpu.evaluation import evaluate_folder
    from diner_tpu.train.config import load_train_config
    from diner_tpu.train.loop import Trainer
    from diner_tpu.train import checkpoint as ckpt_lib
    from diner_tpu.train.diner import create_state, make_eval_step

    run_cfg = load_train_config(args.config, model_name=args.model)
    dcfg = run_cfg.diner
    if args.nsamples is not None:
        rend = dcfg.renderer
        scale = args.nsamples / rend.n_samples
        rend = dataclasses.replace(
            rend, n_samples=args.nsamples,
            n_gaussian=int(rend.n_gaussian * scale))
        dcfg = dataclasses.replace(dcfg, renderer=rend)
    if args.znear is not None:
        dcfg = dataclasses.replace(dcfg, znear=args.znear)
    if args.zfar is not None:
        dcfg = dataclasses.replace(dcfg, zfar=args.zfar)
    run_cfg.diner = dcfg

    trainer = Trainer(run_cfg)
    example = trainer._to_device_batch(
        next(iter(__import__("diner_tpu.data.loader", fromlist=["DataLoader"])
                  .DataLoader(trainer.val_set, batch_size=1, num_workers=0))))
    # a checkpoint trained with the VGG loss stores vgg_params; the fresh
    # state must carry the same tree structure for orbax to restore it
    vgg_params = None
    if getattr(dcfg, "w_vgg", 0) and dcfg.w_vgg > 0:
        from diner_tpu.losses import init_vgg19_params
        vgg_params = init_vgg19_params()
    model, state = create_state(dcfg, jax.random.PRNGKey(0), example,
                                vgg_params)
    state = ckpt_lib.restore_checkpoint(args.ckpt, state)
    eval_step = jax.jit(make_eval_step(model, dcfg))

    outdir = Path(args.out)
    trainer.create_prediction_folder(model, state, eval_step, outdir,
                                     jax.random.PRNGKey(0),
                                     n_samples=args.n)
    scores = evaluate_folder(outdir, outdir)
    print(scores)


if __name__ == "__main__":
    main()
