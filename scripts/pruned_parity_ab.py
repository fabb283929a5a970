#!/usr/bin/env python
"""PSNR-parity A/B for the two-stage pruned sampler (VERDICT r4 item 4).

Renders the same Random(0) val subset from the same checkpoint twice —
one-stage reference sampler vs the pruned sampler — scores both folders
with the metric suite, and records ΔPSNR/ΔSSIM plus the warm per-image
render times. The pruned mode's certification gate is ΔPSNR ≤ 0.05.

    python -u scripts/pruned_parity_ab.py --config <eval.yaml> \
        --ckpt <step_dir> --n 8 [--nsamples 64] \
        [--n-coarse 125 --n-refine-bins 16]

Writes PRUNED_PARITY_r05.json.
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_arm(name, cfg_path, args, outdir):
    cmd = [sys.executable, "scripts/create_prediction_folder.py",
           "--config", str(cfg_path), "--ckpt", args.ckpt,
           "--out", str(outdir), "--n", str(args.n)]
    if args.nsamples:
        cmd += ["--nsamples", str(args.nsamples)]
    t0 = time.perf_counter()
    p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        print(p.stdout[-2000:], p.stderr[-4000:])
        raise SystemExit(f"{name} arm failed")
    scores = json.loads((outdir / "average_scores.json").read_text())
    return {"render_s_total_incl_compile": round(dt, 1),
            "s_per_image_incl_compile": round(dt / args.n, 2),
            "scores": {k: round(v, 4) for k, v in scores.items()
                       if isinstance(v, float)}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="eval yaml (one-stage)")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--nsamples", type=int, default=64)
    ap.add_argument("--n-coarse", type=int, default=125)
    ap.add_argument("--n-refine-bins", type=int, default=16)
    ap.add_argument("--work", default="outputs/pruned_ab")
    ap.add_argument("--out", default="PRUNED_PARITY_r05.json")
    args = ap.parse_args()

    import yaml

    work = Path(args.work).resolve()
    work.mkdir(parents=True, exist_ok=True)
    cfg = yaml.safe_load(Path(args.config).read_text())
    base_cfg = work / "eval_onestage.yaml"
    base_cfg.write_text(yaml.dump(cfg))
    kw = cfg["renderer"].setdefault("kwargs", {})
    kw["n_coarse_candidates"] = args.n_coarse
    kw["n_refine_bins"] = args.n_refine_bins
    pruned_cfg = work / "eval_pruned.yaml"
    pruned_cfg.write_text(yaml.dump(cfg))

    out = {"ckpt": args.ckpt, "n_images": args.n,
           "nsamples": args.nsamples,
           "pruned": {"n_coarse": args.n_coarse,
                      "n_refine_bins": args.n_refine_bins}}
    out["onestage"] = run_arm("onestage", base_cfg, args, work / "onestage")
    out["pruned_arm"] = run_arm("pruned", pruned_cfg, args, work / "pruned")
    d_psnr = out["pruned_arm"]["scores"]["psnr"] \
        - out["onestage"]["scores"]["psnr"]
    d_ssim = out["pruned_arm"]["scores"]["ssim"] \
        - out["onestage"]["scores"]["ssim"]
    out["delta_psnr"] = round(d_psnr, 4)
    out["delta_ssim"] = round(d_ssim, 4)
    out["parity_gate_abs_delta_psnr_le_0.05"] = bool(abs(d_psnr) <= 0.05)

    (REPO / args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
