"""MVS dataset / training-step / write_prediction tests on fixtures."""

import pytest

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from diner_tpu.data.io import write_pfm
from diner_tpu.mvs.datasets import MVSDTUDataset, quad_grid_ids, prepare_img
from diner_tpu.mvs.model import TransMVSNetConfig
from diner_tpu.mvs.train import (
    MVSTrainConfig,
    create_mvs_state,
    make_mvs_train_step,
    warmup_multistep_schedule,
    write_prediction,
)


def test_quad_grid_ids():
    targets, srcs = quad_grid_ids(train=False)
    assert targets == [10, 30, 6, 35]
    assert srcs[0] == [30, 6, 35]
    assert srcs[1] == [10, 6, 35]
    targets_t, srcs_t = quad_grid_ids(train=True)
    assert len(targets_t) == 36 and len(srcs_t) == 36


def test_warmup_multistep_schedule():
    cfg = MVSTrainConfig(lr=1.0, warmup_steps=10, warmup_factor=0.5,
                         milestones=(100, 200), gamma=0.1)
    sched = warmup_multistep_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 0.5)
    np.testing.assert_allclose(float(sched(10)), 1.0)
    np.testing.assert_allclose(float(sched(150)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 0.01, rtol=1e-6)


def _write_mvs_fixture(root):
    rng = np.random.RandomState(0)
    used = sorted({10, 30, 6, 35})
    (root / "Cameras/train").mkdir(parents=True)
    for i in range(49):
        K = np.array([[361.5, 0, 200.0], [0, 361.5, 150.0], [0, 0, 1]])
        E = np.eye(4)
        E[:3, 3] = [0.01 * i, 0, 600]
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
        lines += ["", "425.0 2.5"]
        (root / "Cameras/train" / f"{i:08d}_cam.txt").write_text(
            "\n".join(lines) + "\n")
    scan = "scan1"
    (root / "Rectified" / f"{scan}_train").mkdir(parents=True)
    (root / "Depths" / scan).mkdir(parents=True)
    for vid in used:
        img = (rng.rand(1200, 1600, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "Rectified" / f"{scan}_train" /
                                  f"rect_{vid + 1:03d}_3_r5000.png")
        depth = (rng.rand(1200, 1600) * 100 + 500).astype(np.float32)
        write_pfm(root / "Depths" / scan / f"depth_map_{vid:04d}.pfm", depth)
        vis = (rng.rand(1200, 1600) * 255).astype(np.uint8)
        Image.fromarray(vis).save(root / "Depths" / scan /
                                  f"depth_visual_{vid:04d}.png")
    return scan


def test_mvs_dtu_dataset(tmp_path):
    root = tmp_path / "DTU"
    root.mkdir()
    _write_mvs_fixture(root)
    listfile = tmp_path / "list.txt"
    listfile.write_text("scan1\n")
    ds = MVSDTUDataset(root, listfile, "val", nviews=4, ndepths=48)
    assert len(ds) == 4  # 4 quad targets, light 3 only
    s = ds[0]
    # images are prepare_img'd to the GT resolution (upstream semantics;
    # the fork feeds raw 1200×1600 against 512×640 GT — defect, not kept)
    assert s["imgs"].shape == (4, 512, 640, 3)
    assert s["depth"]["stage3"].shape == (512, 640)
    assert s["depth"]["stage1"].shape == (128, 160)
    assert s["mask"]["stage2"].shape == (256, 320)
    assert s["depth_values"].shape == (48,)
    np.testing.assert_allclose(s["depth_values"][0], 425.0)
    np.testing.assert_allclose(
        np.diff(s["depth_values"]), 2.5 * 1.06, rtol=2e-5)
    # stage intrinsics scaling
    np.testing.assert_allclose(s["proj_matrices"]["stage3"][:, 1, 0, 0],
                               4 * s["proj_matrices"]["stage1"][:, 1, 0, 0])
    assert s["dpath"] == "Depths/scan1/depth_map_0010.pfm"


def test_prepare_img_shapes():
    hr = np.arange(1200 * 1600, dtype=np.float32).reshape(1200, 1600)
    out = prepare_img(hr)
    assert out.shape == (512, 640)


class _ToyMVSDataset:
    """Single tiny sample for the write_prediction protocol test."""

    def __init__(self, H=32, W=32):
        rng = np.random.RandomState(1)
        K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]],
                     np.float32)
        projs = {}
        for s, scale in [("stage1", 4), ("stage2", 2), ("stage3", 1)]:
            pm = np.zeros((3, 2, 4, 4), np.float32)
            for v in range(3):
                E = np.eye(4, dtype=np.float32)
                E[0, 3] = 0.1 * v
                pm[v, 0] = E
                pm[v, 1, :3, :3] = K / scale
                pm[v, 1, 2, 2] = 1
            projs[s] = pm
        self.sample = {
            "imgs": rng.rand(3, H, W, 3).astype(np.float32),
            "proj_matrices": projs,
            "depth_values": np.linspace(2, 6, 48, dtype=np.float32),
            "mask": {"stage3": np.ones((H, W), np.float32)},
            "dpath": "Depths/scan1/depth_map_0000.pfm",
        }

    def __len__(self):
        return 1

    def __getitem__(self, i):
        return self.sample


@pytest.mark.slow
def test_mvs_train_step_and_write_prediction(tmp_path):
    cfg = MVSTrainConfig(
        model=TransMVSNetConfig(ndepths=(8, 8, 8), cr_base_chs=(4, 4, 4),
                                base_channels=4),
        warmup_steps=2, milestones=(1000,))
    ds = _ToyMVSDataset()
    s = ds[0]
    batch = {
        "imgs": jnp.asarray(s["imgs"])[None],
        "proj_matrices": {k: jnp.asarray(v)[None]
                          for k, v in s["proj_matrices"].items()},
        "depth_values": jnp.asarray(s["depth_values"])[None],
        "depth": {k: jnp.asarray(np.full(v, 4.0, np.float32))[None]
                  for k, v in [("stage1", (8, 8)), ("stage2", (16, 16)),
                               ("stage3", (32, 32))]},
        "mask": {k: jnp.ones((1,) + v)
                 for k, v in [("stage1", (8, 8)), ("stage2", (16, 16)),
                              ("stage3", (32, 32))]},
    }
    model, state, tx = create_mvs_state(cfg, jax.random.PRNGKey(0), batch)
    step_fn = jax.jit(make_mvs_train_step(model, cfg, tx))
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state["step"]) == 3
    assert float(metrics["skipped"]) == 0.0

    # write_prediction protocol: uint16 PNGs + conf + vis, depth unscaled
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    out = write_prediction(model, variables, ds, tmp_path, depth_scale=1.0)
    assert len(out) == 1
    from diner_tpu.data.io import read_depth_png
    d = read_depth_png(tmp_path / "Depths/scan1/depth_map_0000_TransMVSNet.png")
    assert d.shape == (32, 32)
    assert 1.0 < d.mean() < 7.0
    c = read_depth_png(
        tmp_path / "Depths/scan1/depth_map_0000_TransMVSNet_conf.png")
    assert (c >= 0).all() and (c <= 1.0 + 1e-3).all()
    assert (tmp_path / "Depths/scan1/depth_map_0000_TransMVSNet_vis.png").exists()

    # checkpoint resume (the reference's finetune.py flow: restore a trained
    # state and keep stepping, deps/TransMVSNet/train.py:419-428)
    from diner_tpu.train import checkpoint as ckpt_lib
    ckpt_dir = tmp_path / "ckpts"
    ckpt_lib.save_checkpoint(ckpt_dir, state, step=int(state["step"]))
    latest = ckpt_lib.latest_checkpoint(ckpt_dir)
    assert latest and latest.endswith("step_00000003")
    template = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt_lib.restore_checkpoint(latest, template)
    assert int(restored["step"]) == 3
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(state["params"]),
                 jax.device_get(restored["params"]))
    state2, metrics2 = step_fn(restored, batch)
    assert int(state2["step"]) == 4
    assert np.isfinite(float(metrics2["loss"]))


def test_facescape_mvs_dataset(tmp_path):
    import json
    from diner_tpu.mvs.facescape_dataset import (
        MVSFacescapeDataset,
        build_facescape_mvs_metas,
    )

    # fixture: one scan, two views with RGBA + depth + cameras
    root = tmp_path / "facescape"
    scan = root / "s01" / "f01"
    H = W = 32
    rng = np.random.RandomState(0)
    cams = {}
    for vid in ("1", "2"):
        vdir = scan / f"view_{int(vid):05d}"
        vdir.mkdir(parents=True)
        rgba = (rng.rand(H, W, 4) * 255).astype(np.uint8)
        rgba[..., 3] = 255
        Image.fromarray(rgba).save(vdir / "rgba_colorcalib_v2.png")
        depth = (rng.rand(H, W) * 2 * 1e4).astype(np.uint16)
        Image.fromarray(depth).save(vdir / "depth.png")
        cams[vid] = {"extrinsics": np.hstack([np.eye(3),
                                              [[0], [0], [float(vid)]]]
                                             ).tolist(),
                     "intrinsics": [[50.0, 0, 16], [0, 50.0, 16],
                                    [0, 0, 1]]}
    (scan / "cameras.json").write_text(json.dumps(cams))

    split = tmp_path / "splits"
    split.mkdir()
    metas = [{"scan_path": "s01/f01", "targets": ["1"],
              "l_refs": ["1"], "r_refs": ["2"],
              "l_refs_val": ["1"], "r_refs_val": ["2"]}]
    (split / "train_metas_binocular.txt").write_text(json.dumps(metas))
    (split / "val_metas_binocular.txt").write_text(json.dumps(metas))

    ms = build_facescape_mvs_metas(split, "write_prediction")
    assert len(ms) == 2  # each eye once as reference

    ds = MVSFacescapeDataset(root, "write_prediction", nviews=2,
                             ndepths=48, split_dir=split)
    s = ds[0]
    assert s["imgs"].shape == (2, H, W, 3)
    assert s["depth"]["stage3"].shape == (H, W)
    assert s["depth_values"].shape == (48,)
    np.testing.assert_allclose(s["depth_values"][0], 1.0)
    np.testing.assert_allclose(s["depth_values"][-1], 2.5)
    np.testing.assert_allclose(
        s["proj_matrices"]["stage3"][:, 1, 0, 0],
        4 * s["proj_matrices"]["stage1"][:, 1, 0, 0])
