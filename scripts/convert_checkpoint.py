#!/usr/bin/env python
"""Convert a reference (PyTorch Lightning) DINER checkpoint to this
framework's orbax format.

The reference saves Lightning checkpoints whose ``state_dict`` keys are
``nerf.encoder.*`` / ``nerf.mlp_fine.*`` (``src/models/diner.py:47``,
``src/models/pixelnerf.py:15-21``); this converts those tensors with
``diner_tpu.utils.torch_convert.convert_pixelnerf`` and writes an eval-ready
checkpoint (params + batch_stats; optimizer state freshly initialized).

    python scripts/convert_checkpoint.py --ckpt DINER.ckpt \
        --config configs/evaluate_diner_on_dtu.yaml --out outputs/converted
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diner_tpu.utils.platform import respect_env_platform
respect_env_platform()  # JAX_PLATFORMS=cpu must win over plugin pins


def load_torch_state_dict(path):
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    # Lightning uses 'state_dict'; the TransMVSNet trainer saves
    # {'epoch', 'model', 'optimizer'} (train.py:100-104)
    sd = blob.get("state_dict", blob.get("model", blob)) \
        if isinstance(blob, dict) else blob
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .ckpt/.pth")
    ap.add_argument("--config", default=None,
                    help="framework config matching the checkpoint's "
                         "architecture (required for --arch diner)")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--prefix", default="nerf.",
                    help="state-dict key prefix of the PixelNeRF module "
                         "(Lightning DINER uses 'nerf.'; bare PixelNeRF "
                         "state dicts use '')")
    ap.add_argument("--arch", default="diner",
                    choices=["diner", "transmvsnet"],
                    help="checkpoint family: DINER PixelNeRF or a "
                         "TransMVSNet depth-network checkpoint "
                         "(torch.save({'model': ...}), train.py:100-104)")
    ap.add_argument("--ndepths", default="48,32,8",
                    help="(transmvsnet) cascade ndepths for the template")
    args = ap.parse_args()

    import jax
    import numpy as np

    from diner_tpu.train import checkpoint as ckpt_lib
    from diner_tpu.train.config import load_train_config
    from diner_tpu.train.diner import create_state
    from diner_tpu.utils.torch_convert import convert_pixelnerf

    sd = load_torch_state_dict(args.ckpt)
    if args.arch == "transmvsnet":
        return convert_mvs(args, sd)
    if args.prefix:
        sd = {k[len(args.prefix):]: v for k, v in sd.items()
              if k.startswith(args.prefix)}
    if not sd:
        raise SystemExit(f"no keys under prefix {args.prefix!r}")

    if not args.config:
        raise SystemExit("--config is required for --arch diner")
    run_cfg = load_train_config(args.config, model_name="DINER")
    dcfg = run_cfg.diner
    blocks = {"resnet18": (2, 2, 2, 2),
              "resnet34": (3, 4, 6, 3)}[dcfg.nerf.encoder.backbone]
    variables = convert_pixelnerf(
        sd, n_blocks=dcfg.nerf.n_blocks,
        combine_layer=dcfg.nerf.combine_layer,
        num_layers=dcfg.nerf.encoder.num_layers,
        backbone_blocks=blocks)

    # template state from a tiny synthetic batch, then graft the weights
    from diner_tpu.data.synthetic import make_sphere_scene
    batch = make_sphere_scene(H=64, W=64, nv=2)
    model, state = create_state(dcfg, jax.random.PRNGKey(0), batch,
                                max_init_tries=1)

    def graft(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted key {path + k} not in model "
                               f"(architecture/config mismatch?)")
            if isinstance(v, dict):
                out[k] = graft(dst[k], v, path + k + "/")
            else:
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path + k}: model "
                        f"{tuple(dst[k].shape)} vs ckpt {np.shape(v)}")
                out[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
        return out

    state = state.replace(
        params=graft(state.params, variables["params"]),
        batch_stats=graft(state.batch_stats,
                          variables.get("batch_stats", {})),
    )
    out = Path(args.out)
    ckpt_lib.save_checkpoint(out, state, step=0)
    n = len(jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {n} parameter tensors -> {out}")


def convert_mvs(args, sd):
    """Reference TransMVSNet torch checkpoint → orbax (mvs_train resumable).

    Accepts both bare state dicts and the trainer's
    ``torch.save({'epoch', 'model', 'optimizer'})`` blobs, with or without
    a DataParallel ``module.`` prefix."""
    import jax
    import numpy as np

    from diner_tpu.mvs.model import TransMVSNetConfig
    from diner_tpu.mvs.train import MVSTrainConfig, create_mvs_state
    from diner_tpu.train import checkpoint as ckpt_lib
    from diner_tpu.utils.torch_convert import convert_transmvsnet

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    variables = convert_transmvsnet(sd, num_stage=len(ndepths))

    cfg = MVSTrainConfig(model=TransMVSNetConfig(ndepths=ndepths))
    H = W = 32
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                    np.float32)
    proj = {}
    for si, scale in enumerate([0.25, 0.5, 1.0][: len(ndepths)]):
        P = np.zeros((1, 2, 2, 4, 4), np.float32)
        for v in range(2):
            P[0, v, 0] = np.eye(4, dtype=np.float32)
            P[0, v, 0, 0, 3] = 0.1 * v
            K = intr.copy()
            K[:2] *= scale
            P[0, v, 1, :3, :3] = K
        proj[f"stage{si + 1}"] = P
    example = {
        "imgs": np.zeros((1, 2, H, W, 3), np.float32),
        "proj_matrices": proj,
        "depth_values": np.linspace(2.0, 6.0, 48,
                                    dtype=np.float32)[None],
    }
    model, state, tx = create_mvs_state(cfg, jax.random.PRNGKey(0), example)

    def graft(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted key {path + k} not in model")
            if isinstance(v, dict):
                out[k] = graft(dst[k], v, path + k + "/")
            else:
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path + k}: model "
                        f"{tuple(dst[k].shape)} vs ckpt {np.shape(v)}")
                out[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
        return out

    state["params"] = graft(state["params"], variables["params"])
    state["batch_stats"] = graft(state["batch_stats"],
                                 variables["batch_stats"])
    from pathlib import Path as _P
    out = _P(args.out)
    ckpt_lib.save_checkpoint(out, state, step=0)
    n = len(jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {n} TransMVSNet tensors -> {out}")


if __name__ == "__main__":
    main()
