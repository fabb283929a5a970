"""Multiface MVS dataset tests (parity target:
deps/TransMVSNet/datasets/multiface.py)."""

import json

import numpy as np

from diner_tpu.mvs.multiface_dataset import (
    MVSMultifaceDataset,
    build_multiface_mvs_metas,
)

from tests.test_multiface import _write_multiface_fixture


def test_build_multiface_mvs_metas_leave_one_out():
    diner_metas = [
        # two DINER metas for the same frame (different targets) → one group
        dict(scan_path="subj/images/SEQ1/camA/000001.png",
             target_id="camA", ref_ids=["c0", "c1", "c2", "c3"]),
        dict(scan_path="subj/images/SEQ1/camB/000001.png",
             target_id="camB", ref_ids=["c0", "c1", "c2", "c3"]),
        dict(scan_path="subj/images/SEQ1/camA/000002.png",
             target_id="camA", ref_ids=["c0", "c1", "c2", "c3"]),
    ]
    metas = build_multiface_mvs_metas(diner_metas, nviews=4)
    assert len(metas) == 8  # 2 unique frames × 4 leave-one-out
    first = metas[:4]
    assert [m["target_ids"] for m in first] == ["c0", "c1", "c2", "c3"]
    assert first[1]["ref_ids"] == ["c0", "c2", "c3"]
    assert all(m["scan_path"].endswith("000001.png") for m in first)


def _four_center_split(split_path):
    split = json.loads(split_path.read_text())
    for stage in split.values():
        stage["ref_centers"] = stage["ref_centers"][:4]
    split_path.write_text(json.dumps(split))


def test_mvs_multiface_dataset(tmp_path):
    root, split = _write_multiface_fixture(tmp_path)
    _four_center_split(split)
    ds = MVSMultifaceDataset(root, "train", nviews=4, ndepths=32,
                             downsample_factor=0.5, split_config=split,
                             meta_dir=tmp_path / "mvs_meta")
    assert len(ds) % 4 == 0 and len(ds) > 0
    s = ds[0]
    V, H, W, C = s["imgs"].shape
    assert (V, C) == (4, 3)
    assert H % 32 == 0 and W % 32 == 0
    # uniform hypotheses over [0.5, 1.5]
    np.testing.assert_allclose(s["depth_values"][0], 0.5)
    np.testing.assert_allclose(s["depth_values"][-1], 1.5)
    np.testing.assert_allclose(
        s["depth_interval"], (1.5 - 0.5) / 31, rtol=1e-6)
    # stage pyramid shapes
    assert s["depth"]["stage3"].shape == (H, W)
    assert s["depth"]["stage1"].shape == (H // 4, W // 4)
    assert s["mask"]["stage2"].shape == (H // 2, W // 2)
    # exact (W//k)/W stage intrinsic ratios (multiface.py:272-287)
    p1 = s["proj_matrices"]["stage1"]
    p3 = s["proj_matrices"]["stage3"]
    np.testing.assert_allclose(p1[:, 1, 0, 0],
                               p3[:, 1, 0, 0] * ((W // 4) / W), rtol=1e-6)
    # extrinsics mm → m
    assert np.abs(p3[:, 0, :3, 3]).max() < 10.0
    # masked region is whitened
    m = s["mask"]["stage3"]
    assert s["imgs"][0][m < 1].mean() > 0.95
    assert s["dpath"].endswith("000001.png")

    # each view of the leave-one-out group references a distinct target
    targets = [ds.metas[i]["target_ids"] for i in range(4)]
    assert len(set(targets)) == 4
