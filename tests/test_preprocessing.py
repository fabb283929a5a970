"""Preprocessing tests: TPU mesh rasterizer against analytic depth, masked
downsampling parity vs the torch reference semantics, color calibration
recovers a known affine distortion."""

import numpy as np
import torch
import jax.numpy as jnp

from diner_tpu.preprocessing import (
    apply_color_calibration,
    color_calibration_affine,
    masked_downsampling,
    rasterize_depth,
)
from diner_tpu.preprocessing.rasterize import load_obj_vertices_faces


def test_rasterize_quad_depth():
    # two triangles forming a unit quad at z = 2, centered on the axis
    verts = np.array([[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    H = W = 32
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    Rt = np.eye(4, dtype=np.float32)
    d = np.asarray(rasterize_depth(jnp.asarray(verts), jnp.asarray(faces),
                                   jnp.asarray(K), jnp.asarray(Rt), H, W,
                                   pixel_block=256, face_chunk=2))
    # quad projects to u = x/z*f + cx = ±10 + 16 → a ~20x20 px footprint
    assert abs(d[16, 16] - 2.0) < 1e-3
    assert d[1, 1] == 0.0  # corner outside the quad
    covered = (d > 0).sum()
    assert 18 * 18 < covered < 22 * 22


def test_rasterize_depth_order():
    # near triangle should occlude far one
    verts = np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2],
                      [-1, -1, 1], [1, -1, 1], [0, 1, 1]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    H = W = 16
    K = np.array([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]], np.float32)
    d = np.asarray(rasterize_depth(jnp.asarray(verts), jnp.asarray(faces),
                                   jnp.asarray(K), jnp.asarray(np.eye(4,
                                   dtype=np.float32)), H, W,
                                   pixel_block=64, face_chunk=2))
    inside = d[d > 0]
    np.testing.assert_allclose(inside.min(), 1.0, atol=1e-3)


def test_obj_parser(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    v, f = load_obj_vertices_faces(p)
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


def test_masked_downsampling_matches_torch_reference():
    rng = np.random.RandomState(0)
    H = W = 16
    x = rng.rand(H, W, 3).astype(np.float32)
    mask = (rng.rand(H, W, 1) > 0.4).astype(np.float32)
    ours = masked_downsampling(x, mask, 4, bg_color=0.25)

    # torch re-statement of torch_helpers.masked_downsampling (average mode)
    xt = torch.from_numpy(np.transpose(x, (2, 0, 1)))[None].clone()
    mt = torch.from_numpy(np.transpose(mask, (2, 0, 1)))[None]
    xt.permute(0, 2, 3, 1)[mt[:, 0] < 1] = 0
    x_sum = torch.nn.functional.avg_pool2d(xt, 4, 4, divisor_override=1)
    m_sum = torch.nn.functional.avg_pool2d(mt, 4, 4, divisor_override=1)
    # nearest-downsampled mask (grid_sample nearest at cell centers)
    rows = (np.arange(H // 4) * 4 + 2).clip(0, H - 1)
    m_nearest = mask[rows][:, rows][..., 0]
    fg = torch.from_numpy(m_nearest > 0)
    ref = x_sum.clone()
    ref.permute(0, 2, 3, 1)[0][fg] = (x_sum / m_sum.clamp(min=1e-12)
                                      ).permute(0, 2, 3, 1)[0][fg]
    ref.permute(0, 2, 3, 1)[0][~fg] = 0.25
    ref = ref[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_color_calibration_recovers_affine():
    rng = np.random.RandomState(1)
    n_verts = 400
    true_colors = rng.rand(n_verts, 3).astype(np.float64) * 0.8 + 0.1

    # camera 0 sees true colors; camera 1 sees an affine-distorted version
    A_true = np.array([[0.9, 0.02, 0.0, 0.05],
                       [0.0, 1.1, 0.01, -0.03],
                       [0.01, 0.0, 0.95, 0.02]])
    idx0 = np.arange(0, 380)
    idx1 = np.arange(20, 400)
    c0 = true_colors[idx0]
    h = np.concatenate([true_colors[idx1], np.ones((len(idx1), 1))], -1)
    c1 = h @ A_true.T

    out = color_calibration_affine([c0, c1], [idx0, idx1], n_verts)
    # applying the fitted corrector to cam-1 colors should get close to the
    # cross-camera mean (≈ halfway between true and distorted)
    corrected = apply_color_calibration(c1[None], out[1])[0]
    mean_ref = 0.5 * (true_colors[idx1] + c1)
    # overlapping region only (both cams observed)
    overlap = np.isin(idx1, idx0)
    err_before = np.abs(c1[overlap] - mean_ref[overlap]).mean()
    err_after = np.abs(corrected[overlap] - mean_ref[overlap]).mean()
    assert err_after < 0.5 * err_before
