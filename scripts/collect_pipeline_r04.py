#!/usr/bin/env python
"""Assemble PIPELINE_HW_r04.json from the round-4 long-horizon run.

VERDICT r3 item 5: 10k-step DTU-protocol training with a DELIBERATE
mid-run kill + resume, val hooks every 500, full curve to plateau.
Reads the run's metrics.jsonl + PIPELINE_RESULT.json and records the
curve, the resume seam, and the final eval.
"""

import json
import sys
from pathlib import Path

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/pipeline_r04")


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
    # the deliberate SIGKILL at ~step 1800 produced two passes over the
    # 1501-1800 window: train-loss rows with duplicate step ids mark it
    seen, dup_steps = set(), []
    for r in rows:
        if "total" in r:
            if r["step"] in seen:
                dup_steps.append(r["step"])
            seen.add(r["step"])

    result_path = WORK / "PIPELINE_RESULT.json"
    final = json.loads(result_path.read_text()) if result_path.exists() \
        else None

    out = {
        "protocol": ("DTU fixture, reference train recipe (256x320, MSE + "
                     "0.1 VGG + antibias, lr 1e-4, bf16), val hook every "
                     "500 steps (4 held-out views + cam sweep), MVS depth "
                     "maps from the 40-step full-res TransMVSNet stage"),
        "resume_seam": {
            "killed": "SIGKILL at ~step 1800 (mid 1500-2000 interval, no "
                      "graceful save) — deliberate, VERDICT r3 item 5",
            "restored_from": "checkpoint step_00001500 (orbax)",
            "retrained_window": "1501-1800 (duplicate step ids in "
                                "metrics.jsonl are the forensic record)",
            "duplicate_steps_logged": sorted(set(dup_steps))[:5],
            "post_seam_config_change": "cam sweeps trimmed 4x30 -> 1x15 "
                                       "frames per hook (wall-clock); val "
                                       "scoring protocol unchanged (same "
                                       "4 held-out views)",
        },
        "val_curve": curve,
        "final_eval": final,
    }
    Path("PIPELINE_HW_r04.json").write_text(json.dumps(out, indent=2))
    print(json.dumps({"curve_points": len(curve),
                      "last": curve[-1] if curve else None}))
    print("wrote PIPELINE_HW_r04.json")


if __name__ == "__main__":
    main()
