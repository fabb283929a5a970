"""SphereDataset variant schemas (the hardware-smoke data source for
KeypointNeRF / NOVEL / NOVEL_PE — scripts/smoke_variants.py).

Mirrors how the reference's Facescape loaders serve different modules:
kpt3d/bounds for KeypointNeRF (``src/data/facescape.py:297-363``),
vertices/offsets/gen camera/PE maps for NOVEL(_PE)
(``src/data/facescape_novel.py``).
"""

import numpy as np

from diner_tpu.data.synthetic_dataset import SphereDataset


def test_keypointnerf_schema():
    ds = SphereDataset(n=2, H=16, W=16, nv=2, model="KeypointNeRF", n_kpt=8)
    s = ds[0]
    assert s["target_kpt3d"].shape == (8, 3)
    # keypoints lie on the sphere surface (radius 0.5)
    r = np.linalg.norm(s["target_kpt3d"], axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=1e-5)
    assert s["bounds"].shape == (2, 3)
    assert (s["bounds"][0] < -0.5).all() and (s["bounds"][1] > 0.5).all()
    assert s["target_mask"].shape == (16, 16)


def test_novel_schema_and_determinism():
    ds = SphereDataset(n=2, H=16, W=16, nv=2, model="NOVEL", n_vertices=32)
    s = ds[0]
    assert s["gen_extrinsics"].shape == (4, 4)
    assert s["target_vertices"].shape == (32, 3)
    assert (s["offset_target_to_source"] == 0).all()
    assert "target_pos_encoding" not in s
    s2 = ds[0]
    np.testing.assert_array_equal(s["target_vertices"],
                                  s2["target_vertices"])
    # val split uses different keypoint seeds than train
    val = SphereDataset(n=2, H=16, W=16, nv=2, model="NOVEL", n_vertices=32,
                        stage="val")[0]
    assert not np.array_equal(val["target_vertices"], s["target_vertices"])


def test_novel_pe_schema():
    ds = SphereDataset(n=2, H=16, W=16, nv=3, model="NOVEL_PE")
    s = ds[0]
    assert s["src_pos_encodings"].shape == (3, 16, 16, 3)
    assert s["target_pos_encoding"].shape == (16, 16, 3)
    assert np.isfinite(s["src_pos_encodings"]).all()


def test_diner_schema_unchanged():
    s = SphereDataset(n=2, H=16, W=16, nv=2)[0]
    for k in ("target_kpt3d", "bounds", "gen_extrinsics",
              "target_vertices"):
        assert k not in s
