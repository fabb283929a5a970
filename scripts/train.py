#!/usr/bin/env python
"""Train driver.

Usage (mirrors the reference CLI ``python_scripts/train.py:21-28`` but with
the model name optional):

    python scripts/train.py <config.yaml> [MODEL_NAME] [--max-steps N]
        [--mesh] [--data-parallel K] [--num-workers N]

--mesh trains over all visible devices on a ('data', 'rays') mesh.
"""

import argparse
import sys
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
    ap.add_argument("config")
    ap.add_argument("model", nargs="?", default="DINER",
                    choices=["DINER", "KeypointNeRF", "NOVEL", "NOVEL_PE"])
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all devices ('data' x 'rays')")
    ap.add_argument("--data-parallel", type=int, default=None)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: error at the first NaN-producing "
                         "op (TPU-native NaN sentinel, SURVEY §5)")
    args = ap.parse_args()

    if args.debug_nans:
        import jax
        jax.config.update("jax_debug_nans", True)

    from diner_tpu.train.config import load_train_config
    from diner_tpu.train.loop import Trainer

    run_cfg = load_train_config(args.config, model_name=args.model)

    mesh = None
    if args.mesh:
        from diner_tpu.parallel import make_mesh
        mesh = make_mesh(data_parallel=args.data_parallel)
        print(f"training over mesh {dict(mesh.shape)}")

    if args.model == "DINER":
        trainer = Trainer(run_cfg, mesh=mesh, num_workers=args.num_workers)
        trainer.fit(max_steps=args.max_steps)
    elif args.model == "KeypointNeRF":
        from diner_tpu.models.keypointnerf.train import fit_keypointnerf
        fit_keypointnerf(run_cfg, max_steps=args.max_steps)
    else:
        from diner_tpu.models.novel.train import fit_novel
        fit_novel(run_cfg, max_steps=args.max_steps,
                  use_pe=(args.model == "NOVEL_PE"))


if __name__ == "__main__":
    main()
