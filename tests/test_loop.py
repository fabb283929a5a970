"""End-to-end trainer-loop tests on the synthetic config: fit, checkpoint,
resume, validation artifacts (prediction folder + scores + cam sweep)."""

import pytest

import json
from pathlib import Path

import jax
import numpy as np
import yaml

from diner_tpu.train.config import load_train_config
from diner_tpu.train.loop import Trainer


def _cfg(tmp_path, **overrides):
    with open(Path(__file__).parents[1] / "configs/train_synthetic.yaml") as f:
        raw = yaml.safe_load(f)
    raw["logger"]["kwargs"]["save_dir"] = str(tmp_path / "out")
    raw["data"]["train"]["dataset"]["kwargs"].update(
        {"n": 4, "H": 24, "W": 24})
    raw["data"]["val"]["dataset"]["kwargs"].update({"n": 2, "H": 24, "W": 24})
    raw["renderer"]["kwargs"].update(
        {"n_samples": 8, "n_depth_candidates": 32, "n_gaussian": 2,
         "ray_chunk": 192})
    raw["checkpointing"]["kwargs"]["every_n_train_steps"] = 4
    raw.update(overrides)
    p = tmp_path / "cfg.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(raw, f)
    return p


def test_config_compute_dtype_reaches_model(tmp_path):
    """Regression: ``nerf.kwargs.compute_dtype`` must not be silently
    dropped by the config builder (it was — every YAML-driven run trained
    in f32 regardless of the recipe's bf16 setting)."""
    cfgp = _cfg(tmp_path)
    raw = yaml.safe_load(open(cfgp))
    raw["nerf"]["kwargs"]["compute_dtype"] = "bfloat16"
    with open(cfgp, "w") as f:
        yaml.safe_dump(raw, f)
    run_cfg = load_train_config(cfgp)
    assert run_cfg.diner.nerf.compute_dtype == "bfloat16"


@pytest.mark.slow
def test_fit_checkpoint_resume(tmp_path):
    cfgp = _cfg(tmp_path)
    run_cfg = load_train_config(cfgp)
    trainer = Trainer(run_cfg, num_workers=0)
    state = trainer.fit(max_steps=4)
    assert int(state.step) == 4
    ckpts = list((run_cfg.run_dir / "checkpoints").glob("step_*"))
    assert ckpts

    # resume continues from the checkpoint
    trainer2 = Trainer(load_train_config(cfgp), num_workers=0)
    state2 = trainer2.fit(max_steps=6)
    assert int(state2.step) == 6

    logs = (run_cfg.run_dir / "logs" / "metrics.jsonl").read_text()
    assert "rgb_fine" in logs


@pytest.mark.slow
def test_validation_artifacts(tmp_path):
    cfgp = _cfg(tmp_path)
    run_cfg = load_train_config(cfgp)
    run_cfg.cam_sweep_settings = dict(nframes=2, n_cam_sweeps=1, fps=2)
    trainer = Trainer(run_cfg, num_workers=0)

    example = trainer._to_device_batch(
        {k: np.asarray(v)[None] for k, v in trainer.val_set[0].items()
         if isinstance(v, np.ndarray)})
    model, state = trainer._init_state(example)
    _, eval_step = trainer._jit_steps(model)

    scores = trainer.validate(model, state, eval_step, jax.random.PRNGKey(0))
    assert {"psnr", "ssim", "l1", "l2"} <= set(scores)
    eval_dir = run_cfg.run_dir / f"eval_{int(state.step):06d}"
    vis = eval_dir / "visualizations"
    assert list(vis.glob("*-pred.png"))
    assert list(vis.glob("*-gt.png"))
    assert list(vis.glob("*-depth.png"))
    assert (eval_dir / "average_scores.json").exists()
    with open(eval_dir / "average_scores.json") as f:
        assert json.load(f)["psnr"] > 0
    sweeps = list((eval_dir / "cam_sweeps").glob("*"))
    assert sweeps  # video (mp4 or gif fallback) + ref image


def test_select_eval_indices_dedupes_name_collisions():
    """The Random(0) subset protocol must score n UNIQUE sample names even
    when metas collide across DTU's 7 lights (reference last-write-wins
    quirk, dtu.py:231 / create_prediction_folder.py:37-40)."""
    import random
    from diner_tpu.train.loop import select_eval_indices

    class FakeDTU:
        def __len__(self):
            return 70  # 10 names x 7 lights

        def sample_name_of(self, i):
            return f"scan1-{i % 10}"

    ds = FakeDTU()
    picked = select_eval_indices(ds, 8)
    names = [ds.sample_name_of(i) for i in picked]
    assert len(picked) == 8
    assert len(set(names)) == 8
    # the reference's exact draw is a prefix filter: every picked index
    # either IS in Random(0).sample or replaces a name collision from it
    first = random.Random(0).sample(list(range(70)), 8)
    kept_from_first = [i for i in first if i in picked]
    seen = set()
    expect = [i for i in first
              if not (ds.sample_name_of(i) in seen
                      or seen.add(ds.sample_name_of(i)))]
    assert kept_from_first == expect
    # more names requested than exist -> all 10, no dupes, no hang
    picked_all = select_eval_indices(ds, 50)
    assert sorted({ds.sample_name_of(i) for i in picked_all}) == sorted(
        {f"scan1-{k}" for k in range(10)})
    # datasets without sample_name_of keep plain index dedupe
    class Plain:
        def __len__(self):
            return 20
    assert len(select_eval_indices(Plain(), 5)) == 5
