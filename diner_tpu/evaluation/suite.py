"""Folder-protocol evaluation suite.

Parity target: reference ``src/evaluation/eval_suite.py`` — walks
``*-gt.png`` / ``*-pred.png`` pairs, scores SSIM/PSNR/L2/L1 (+ LPIPS),
writes ``average_scores.json``, ``detailed_report.json``, and a contact
sheet of examples; plus ``compare_evaluations`` summarizing several models.
File-name suffix protocol kept identical so outputs are directly comparable
with reference runs.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from diner_tpu.evaluation.metrics import (
    init_lpips_proxy,
    l1,
    lpips_distance,
    mse,
    psnr,
    ssim,
)

METRIC_OPT_DICT = dict(l1="-", l2="-", lpips="-", psnr="+", ssim="+")
METRIC_LIMIT_DICT = dict(l1=[0, 0.1], l2=[0, 0.05], lpips=[0.0, 0.5],
                         psnr=[12, 30], ssim=[0.6, 1.0])
AVERAGE_SCORE_FILENAME = "average_scores.json"
REPORT_DETAIL_FILENAME = "detailed_report.json"
EXAMPLE_PLOT_FILENAME = "examples.png"
N_EXAMPLE_PLOTS = 5
PRED_SUFFIX = "-pred.png"
GT_SUFFIX = "-gt.png"
REF_SUFFIX = "-ref.png"
DEPTH_SUFFIX = "-depth.png"


def _imread(path) -> np.ndarray:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path))


def _imwrite(path, img: np.ndarray):
    import imageio.v2 as imageio
    imageio.imwrite(path, img)


def evaluate_folder(source_dir, outdir, lpips_params="proxy",
                    pred_suffix: str = PRED_SUFFIX,
                    gt_suffix: str = GT_SUFFIX) -> Dict[str, float]:
    """Score every (gt, pred) pair in `source_dir`; write reports to `outdir`.

    lpips_params: "proxy" (fixed-seed fallback, reported as ``lpips_proxy``),
      None (skip), or an LPIPS params dict (reported as ``lpips``).
    """
    source_dir = Path(source_dir)
    outdir = Path(outdir)
    os.makedirs(outdir, exist_ok=True)

    gt_paths = [p for p in sorted(source_dir.iterdir())
                if p.name.endswith(gt_suffix)]
    pred_paths = [p.parent / p.name.replace(gt_suffix, pred_suffix)
                  for p in gt_paths]

    lpips_key = None
    lp = None
    if lpips_params is not None:
        if lpips_params == "proxy":
            lp = init_lpips_proxy()
            lpips_key = "lpips_proxy"
        else:
            lp = lpips_params
            lpips_key = "lpips"

    scores: Dict[str, List[float]] = defaultdict(list)
    for gt_path, pred_path in zip(gt_paths, pred_paths):
        gt = _imread(gt_path).astype(np.float32)[..., :3] / 255.0
        pred = _imread(pred_path).astype(np.float32)[..., :3] / 255.0
        scores["ssim"].append(ssim(pred, gt, data_range=1.0))
        scores["psnr"].append(psnr(pred, gt, data_range=1.0))
        scores["l2"].append(mse(pred, gt))
        scores["l1"].append(l1(pred, gt))
        if lp is not None:
            import jax.numpy as jnp
            d = lpips_distance(
                lp,
                jnp.asarray(pred[None] * 2 - 1),
                jnp.asarray(gt[None] * 2 - 1))
            scores[lpips_key].append(float(np.asarray(d)[0]))

    avg = {k: float(np.mean(v)) for k, v in scores.items()}
    with open(outdir / AVERAGE_SCORE_FILENAME, "w") as f:
        json.dump(avg, f, indent="\t")

    detail = []
    for i, p in enumerate(pred_paths):
        row = {"path": str(p)}
        for k, v in scores.items():
            row[k] = float(v[i])
        detail.append(row)
    with open(outdir / REPORT_DETAIL_FILENAME, "w") as f:
        json.dump(detail, f, indent="\t")

    _write_examples(outdir, pred_paths, pred_suffix)
    return avg


def _write_examples(outdir: Path, pred_paths, pred_suffix: str):
    if not pred_paths:
        return
    idcs = np.linspace(0, len(pred_paths) - 1,
                       min(N_EXAMPLE_PLOTS, len(pred_paths))).astype(int)
    rows = []
    for i in idcs:
        p = pred_paths[i]
        pred = _imread(p)[..., :3]
        H, W = pred.shape[:2]

        def load_or_zero(suffix):
            q = p.parent / p.name.replace(pred_suffix, suffix)
            return _imread(q)[..., :3] if q.exists() else np.zeros_like(pred)

        ref = load_or_zero(REF_SUFFIX)
        gt = load_or_zero(GT_SUFFIX)
        depth = load_or_zero(DEPTH_SUFFIX)
        nref = max(ref.shape[1] // W, 1)
        parts = list(np.hsplit(ref[:, : nref * W], nref)) + [gt, pred, depth]
        rows.append(np.concatenate(parts, axis=1))
    _imwrite(outdir / EXAMPLE_PLOT_FILENAME, np.concatenate(rows, axis=0))


def compare_evaluations(eval_dirs, outdir) -> Dict[str, Dict[str, float]]:
    """Aggregate several models' detailed reports into one comparison JSON
    (+ per-metric best-model table), mirroring eval_suite.compare_evaluations
    without the matplotlib violin plots."""
    outdir = Path(outdir)
    os.makedirs(outdir, exist_ok=True)
    summary = {}
    for d in eval_dirs:
        d = Path(d)
        with open(d / AVERAGE_SCORE_FILENAME) as f:
            summary[d.name] = json.load(f)
    best = {}
    for metric, direction in METRIC_OPT_DICT.items():
        vals = {m: s[metric] for m, s in summary.items() if metric in s}
        if not vals:
            continue
        pick = max(vals, key=vals.get) if direction == "+" else \
            min(vals, key=vals.get)
        best[metric] = pick
    out = {"models": summary, "best": best}
    with open(outdir / "comparison.json", "w") as f:
        json.dump(out, f, indent="\t")
    return out
