"""End-to-end pipeline seam test (VERDICT r2 item 4).

Runs the ONE-COMMAND chain — TransMVSNet training → write_prediction
(uint16 PNGs into the dataset tree) → DINER training consuming those exact
PNGs through data/dtu.py → create_prediction_folder → evaluate_folder — at
tiny shapes on CPU, through the same CLIs a user runs
(scripts/run_pipeline.py --tiny). No hand-made fixtures at the MVS→DINER
seam: the depth/conf PNGs the DINER loader reads are the ones the MVS
subsystem just wrote. Match: reference README.md:105-131,
deps/TransMVSNet/train.py:152-208, src/data/dtu.py:104-108.

Heavy (full-protocol 512×640 MVS shapes compile slowly on CPU): ~45 min,
slow tier. Set DINER_DTU_FIXTURE=<path> to reuse an existing fixture.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_pipeline_end_to_end_tiny(tmp_path):
    fixture = os.environ.get("DINER_DTU_FIXTURE")
    if fixture and Path(fixture, "list.txt").exists():
        root = Path(fixture)
    else:
        root = tmp_path / "dtu_fix"
        p = subprocess.run(
            [sys.executable, "scripts/make_dtu_fixture.py", str(root),
             "--lights", "1"],
            cwd=REPO, capture_output=True, text=True, timeout=1200)
        assert p.returncode == 0, p.stderr[-2000:]

    work = tmp_path / "work"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, "scripts/run_pipeline.py", "--root", str(root),
         "--workdir", str(work), "--tiny", "--mvs-steps", "1",
         "--diner-steps", "20", "--eval-n", "2", "--dtype", "float32"],
        cwd=REPO, capture_output=True, text=True, env=env, timeout=3300)
    assert p.returncode == 0, (p.stdout[-3000:], p.stderr[-2000:])

    # MVS wrote real artifacts into the tree (DINER's source views)
    produced = sorted(root.rglob("depth_map_*_TransMVSNet.png"))
    conf = sorted(root.rglob("depth_map_*_TransMVSNet_conf.png"))
    assert len(produced) >= 4 and len(conf) >= 4

    result = json.loads((work / "PIPELINE_RESULT.json").read_text())
    scores = result["scores"]
    for k in ("psnr", "ssim", "l1", "l2"):
        assert k in scores and scores[k] == scores[k], scores  # finite
    assert scores["psnr"] > 0
    # the prediction folder protocol round-tripped
    preds = list((work / "prediction").glob("*-pred.png"))
    gts = list((work / "prediction").glob("*-gt.png"))
    assert len(preds) == 2 and len(gts) == 2
