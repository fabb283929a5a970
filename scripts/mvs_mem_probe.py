#!/usr/bin/env python
"""Compile the FULL-RES (512x640 / 4 views / 48-32-8) TransMVSNet training
graph on the TPU and report its memory analysis — no step execution.

Iterating on the HBM fit (VERDICT r2 item 2): each candidate layout fix is
validated by recompiling and reading peak HBM + the largest allocations,
instead of waiting for a full training run. On OOM the compiler error text
IS the allocation table; on success `memory_analysis()` reports the peak.

Usage: python -u scripts/mvs_mem_probe.py [--hw 512,640] [--dtype bfloat16]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="512,640")
    ap.add_argument("--numdepth", type=int, default=192)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat-mode", default="full",
                    choices=["full", "selective"])
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split(","))

    import jax

    from diner_tpu.mvs.model import TransMVSNetConfig
    from diner_tpu.mvs.train import (
        MVSTrainConfig, create_mvs_state, make_mvs_train_step)

    cfg = MVSTrainConfig(
        model=TransMVSNetConfig(ndepths=(48, 32, 8),
                                depth_intervals_ratio=(4.0, 1.0, 0.5),
                                remat=True,
                                remat_feature=args.remat_mode == "full"),
        compute_dtype=args.dtype)

    # synthetic batch with the exact training shapes (no dataset needed
    # for a compile probe)
    rng = np.random.default_rng(0)
    V = 4
    proj = np.tile(np.eye(4, dtype=np.float32), (1, V, 2, 1, 1))
    proj[:, :, 1, 0, 0] = proj[:, :, 1, 1, 1] = 360.0
    proj[:, :, 1, 0, 2] = W / 2
    proj[:, :, 1, 1, 2] = H / 2
    for v in range(V):
        proj[:, v, 0, 0, 3] = 5.0 * v
    stages = {"stage1": 4, "stage2": 2, "stage3": 1}
    batch = {
        "imgs": rng.uniform(0, 1, (1, V, H, W, 3)).astype(np.float32),
        "proj_matrices": {k: _scaled(proj, s).astype(np.float32)
                          for k, s in stages.items()},
        "depth": {k: rng.uniform(400, 900, (1, H // s, W // s)).astype(
            np.float32) for k, s in stages.items()},
        "mask": {k: np.ones((1, H // s, W // s), np.float32)
                 for k, s in stages.items()},
        "depth_values": np.linspace(425.0, 905.0, args.numdepth,
                                    dtype=np.float32)[None],
    }

    model, state, tx = create_mvs_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_mvs_train_step(model, cfg, tx)

    t0 = time.perf_counter()
    try:
        compiled = jax.jit(step).lower(state, batch).compile()
    except Exception as e:  # OOM: print the allocation table and exit 2
        print(f"COMPILE FAILED after {time.perf_counter() - t0:.0f}s:")
        print(str(e)[:20000])
        sys.exit(2)
    dt = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    out = {"hw": [H, W], "compile_s": round(dt, 1)}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "peak_memory_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
    print(json.dumps(out))


def _scaled(proj, s):
    p = proj.copy()
    p[:, :, 1, :2] = p[:, :, 1, :2] / s
    return p


if __name__ == "__main__":
    main()
