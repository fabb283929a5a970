"""End-to-end test of scripts/preprocess_multiface.py on a synthetic
subject (KRT + tracked quad mesh)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parents[1]


def _write_subject(root):
    subj = root / "m--test--0--subj--GHS"
    (subj / "tracked_mesh" / "SEQ1").mkdir(parents=True)
    # camera at origin looking +z (extrin = [I | 0]), mesh 1000 mm away
    K = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
    lines = ["cam001"]
    lines += [" ".join(str(v) for v in row) for row in K]
    lines += ["0 0 0 0 0"]
    lines += [" ".join(str(v) for v in row)
              for row in np.hstack([np.eye(3), np.zeros((3, 1))])]
    lines += [""]
    (subj / "KRT").write_text("\n".join(lines) + "\n")
    # a quad (two triangles) spanning x,y ∈ [-200, 200] mm at z = 1000 mm
    obj = ["v -200 -200 1000", "v 200 -200 1000", "v 200 200 1000",
           "v -200 200 1000", "f 1 2 3", "f 1 3 4"]
    (subj / "tracked_mesh" / "SEQ1" / "000001.obj").write_text(
        "\n".join(obj) + "\n")
    return subj


def test_depth_codec_roundtrip(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    import preprocess_multiface as pm
    x = np.array([[0.0, 100.0, 6553.5, 99999.0]], np.float32)
    q = pm.float32_2_uint16(x)
    back = pm.uint16_2_float32(q)
    np.testing.assert_allclose(back[0, :3], [0.0, 100.0, 6553.5])
    assert back[0, 3] == 6553.5  # clipped to the representable max


def test_rendered_depth_values(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    import preprocess_multiface as pm
    subj = _write_subject(tmp_path)
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "preprocess_multiface.py"),
         "--root", str(tmp_path), "-H", "24", "-W", "32"],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr
    d = pm.uint16_2_float32(np.asarray(Image.open(
        subj / "depths" / "SEQ1" / "cam001" / "000001.png")))
    a = np.asarray(Image.open(
        subj / "masks" / "SEQ1" / "cam001" / "000001.png"))
    # quad at z=1000mm projects to uv ∈ [8±8, ...]: center covered
    assert abs(d[12, 16] - 1000.0) < 0.2
    assert a[12, 16] == 255
    # corner uncovered
    assert d[0, 0] == 0.0 and a[0, 0] == 0
    # mask == (depth != 0) everywhere
    np.testing.assert_array_equal(a > 0, d > 0)
