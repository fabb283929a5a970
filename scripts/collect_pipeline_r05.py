#!/usr/bin/env python
"""Assemble PIPELINE_HW_r05.json from the round-5 FULL-PROTOCOL run.

VERDICT r4 item 1: train at the reference DTU recipe's full 512x640
resolution (``src/data/dtu.py:113-114``), scan-split val (unseen scans,
``src/data/dtu.py:130-140``), >=25 views per val hook, and a final eval
over a Random(0) subset of the whole val split
(``python_scripts/create_prediction_folder.py:37-40``) with n_images >= 50
at 512x640 / 64 depth-guided samples. This collector reads the run's
metrics.jsonl + PIPELINE_RESULT.json + the prediction folder's
detailed_report.json and emits the per-scan PSNR/SSIM table the parity
target requires (sample names are ``{scan}-{cam}`` — data/dtu.py).
"""

import json
import re
import sys
from pathlib import Path

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/pipeline_r05")
OUT = sys.argv[2] if len(sys.argv) > 2 else "PIPELINE_HW_r05.json"

# reference eval-suite plot limits = plausible metric ranges
# (src/evaluation/eval_suite.py:15)
METRIC_LIMITS = {"psnr": (12.0, 30.0), "ssim": (0.6, 1.0),
                 "l1": (0.0, 0.1), "l2": (0.0, 0.05)}


def main():
    logs = WORK / "diner/DINER_pipeline/logs/metrics.jsonl"
    rows = [json.loads(l) for l in logs.read_text().splitlines() if l]
    curve = [
        {"step": r["step"],
         "psnr": round(r["valscores_psnr"], 2),
         "ssim": round(r["valscores_ssim"], 4),
         "l1": round(r["valscores_l1"], 4)}
        for r in rows if "valscores_psnr" in r
    ]
    seen, dup_steps = set(), []
    for r in rows:
        if "total" in r:
            if r["step"] in seen:
                dup_steps.append(r["step"])
            seen.add(r["step"])

    result_path = WORK / "PIPELINE_RESULT.json"
    final = json.loads(result_path.read_text()) if result_path.exists() \
        else None

    # ---- per-scan table from the detailed report
    detail_path = WORK / "prediction" / "detailed_report.json"
    per_scan = {}
    n_scored = 0
    if detail_path.exists():
        detail = json.loads(detail_path.read_text())  # list of rows
        by_scan = {}
        for row in detail:
            m = re.match(r"(scan\d+[^-]*)-", Path(row["path"]).name)
            scan = m.group(1) if m else "unknown"
            by_scan.setdefault(scan, []).append(row)
        for scan, items in sorted(by_scan.items()):
            n_scored += len(items)
            per_scan[scan] = {
                "n": len(items),
                **{k: round(sum(i[k] for i in items) / len(items), 4)
                   for k in ("psnr", "ssim", "l1", "l2")
                   if all(k in i for i in items)},
            }

    in_range = {}
    if final and "scores" in final:
        for k, (lo, hi) in METRIC_LIMITS.items():
            if k in final["scores"]:
                v = final["scores"][k]
                in_range[k] = bool(lo <= v <= hi)

    out = {
        "protocol": ("FULL reference DTU protocol on the 6-scan fixture: "
                     "train at 512x640 (downsample 1.0, the reference "
                     "recipe resolution, src/data/dtu.py:113-114) x 4 src "
                     "views, MSE + 0.1 VGG + antibias, lr 1e-4, bf16; "
                     "scan-split val (train scans 1-4, VAL SCANS 5-6 "
                     "unseen); val hook: 25 Random(0)-subset views + cam "
                     "sweep; MVS depths from the full-res TransMVSNet "
                     "stage trained on the train split only; final eval "
                     "over a Random(0) subset of the whole val split at "
                     "512x640 / 64 samples "
                     "(create_prediction_folder.py:37-40)"),
        "val_curve": curve,
        "duplicate_steps_logged": sorted(set(dup_steps))[:8],
        "final_eval": final,
        "per_scan": per_scan,
        "n_images_scored": n_scored,
        "metric_in_reference_range": in_range,
    }
    Path(OUT).write_text(json.dumps(out, indent=2))
    print(json.dumps({"curve_points": len(curve),
                      "last": curve[-1] if curve else None,
                      "per_scan": per_scan,
                      "in_range": in_range}))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
