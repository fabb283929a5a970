"""Golden parity for the C++/OpenMP fusion core against an independent
numpy re-statement of the reference CUDA kernel
(``deps/TransMVSNet/deps/fusibile/fusibile.cu:138-280`` with helpers
:51-133 and host filtering :285-316).

The oracle transcribes the kernel literally:
  - backprojection  X = M⁻¹ (d·px − P₃₄ₓ, d·py − P₃₄ᵧ, d − P₃₄_z)
    (``get3Dpoint_cu`` :56-65, integer pixel coords, no half-pixel offset)
  - projection pt = (x/z, y/z), depth = z (``project_on_camera`` :127-133)
  - texture fetch at (pt + 0.5) with cudaFilterModePoint (main.cpp:444)
    → texel floor(pt + 0.5); backprojection in the other view uses the
    TRUNCATED int pixel (int2 tmp_p = (int)tmp_pt, :229-232)
  - disparity conversion  disp = f_ref · ‖C_ref − C_v‖ / d
    (``disparityDepthConversion_cu2`` :51-54)
  - consistency: |disp(z_proj) − disp(d_v)| < depthThresh AND
    acos(n_ref·n_v) < normalThresh (NaN → 0, ``getAngle_cu`` :118-126)
  - averaging over (count + 1), no renormalization (:246-250)
  - emit when count ≥ numConsistentThresh and X ≠ 0
    (:254-270 + copy_point_cloud_to_host :304)

Scenes are randomized multi-view setups including disagreeing-depth views
that must be rejected.
"""

import numpy as np
import pytest

from diner_tpu.fusion import fusion as F


def _oracle(depths, normals, P, focals, colors, disp_thresh, normal_thresh,
            num_consistent):
    V, rows, cols = depths.shape
    M = P[:, :, :3].astype(np.float64)
    p4 = P[:, :, 3].astype(np.float64)
    Minv = np.linalg.inv(M)
    centers = -np.einsum("vij,vj->vi", Minv, p4)

    def backproject(v, px, py, d):
        pt = np.array([d * px - p4[v, 0], d * py - p4[v, 1], d - p4[v, 2]])
        return Minv[v] @ pt

    out = []
    for ref in range(V):
        for py in range(rows):
            for px in range(cols):
                d = float(depths[ref, py, px])
                n = normals[ref, py, px].astype(np.float64)
                X = backproject(ref, px, py, d)
                cX, cN = X.copy(), n.copy()
                cC = colors[ref, py, px].astype(np.float64).copy()
                consistent = 0
                for v in range(V):
                    if v == ref:
                        continue
                    x = M[v] @ X + p4[v]
                    u, w, z = x[0] / x[2], x[1] / x[2], x[2]
                    if not (0 <= u < cols and 0 <= w < rows):
                        continue
                    # point-filtered texture fetch at (pt + 0.5); CUDA
                    # clamps unnormalized coords to the last texel
                    fu = min(int(np.floor(u + 0.5)), cols - 1)
                    fv = min(int(np.floor(w + 0.5)), rows - 1)
                    dv = float(depths[v, fv, fu])
                    nv = normals[v, fv, fu].astype(np.float64)
                    baseline = np.linalg.norm(centers[ref] - centers[v])
                    with np.errstate(divide="ignore"):
                        disp_a = focals[ref] * baseline / z if z != 0 else np.inf
                        disp_b = focals[ref] * baseline / dv if dv != 0 else np.inf
                    if not abs(disp_a - disp_b) < disp_thresh:
                        continue
                    ang = np.arccos(np.clip(np.dot(nv, n), -np.inf, np.inf))
                    if np.isnan(ang):
                        ang = 0.0
                    if not ang < normal_thresh:
                        continue
                    # backprojection uses the truncated int pixel
                    Xv = backproject(v, int(u), int(w), dv)
                    cX += Xv
                    cN += nv
                    cC += colors[v, fv, fu].astype(np.float64)
                    consistent += 1
                if consistent >= num_consistent:
                    s = 1.0 / (consistent + 1.0)
                    cX, cN, cC = cX * s, cN * s, cC * s
                    if cX[0] != 0 and cX[1] != 0 and cX[2] != 0:
                        out.append(np.concatenate(
                            [cX, cN, cC, [consistent]]))
    return (np.stack(out) if out
            else np.zeros((0, 10)))


def _make_scene(seed, V=4, rows=10, cols=12, bad_views=()):
    """Random multi-view rig looking at a jittered fronto-parallel surface.
    ``bad_views`` get independently perturbed depths (must be rejected)."""
    rng = np.random.RandomState(seed)
    f = 20.0
    K = np.array([[f, 0, cols / 2], [0, f, rows / 2], [0, 0, 1]], np.float32)

    Ps, Es = [], []
    for v in range(V):
        # small rotations + distinct centers (nonzero baselines)
        ang = 0.06 * (v - (V - 1) / 2) + 0.01 * rng.randn()
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.25 * (v - (V - 1) / 2) + 0.02 * rng.randn(),
                      0.02 * rng.randn(), 0.02 * rng.randn()], np.float32)
        E = np.concatenate([R, t[:, None]], axis=1)
        Es.append(E)
        Ps.append(K @ E)
    P = np.stack(Ps)

    # surface: plane z≈2 in world, rendered into each view by projecting
    # a world point grid — simplest consistent depths: for each view pixel,
    # intersect the ray with the plane z_world = 2 + 0.05*sin(x)
    depths = np.zeros((V, rows, cols), np.float32)
    normals = np.zeros((V, rows, cols, 3), np.float32)
    colors = rng.rand(V, rows, cols, 3).astype(np.float32)
    for v in range(V):
        E = Es[v]
        R, t = E[:, :3], E[:, 3]
        Minv = np.linalg.inv(P[v][:, :3])
        center = -Minv @ P[v][:, 3]
        for py in range(rows):
            for px in range(cols):
                ray = Minv @ np.array([px, py, 1.0]) - 0.0
                dirw = ray / np.linalg.norm(ray)
                # solve center + s*dirw hitting plane z=2
                if abs(dirw[2]) < 1e-6:
                    continue
                s = (2.0 - center[2]) / dirw[2]
                Xw = center + s * dirw
                cam_pt = R @ Xw + t
                depths[v, py, px] = cam_pt[2]
                normals[v, py, px] = R @ np.array([0, 0, -1.0])
    for v in bad_views:
        depths[v] *= (1.3 + 0.2 * rng.rand(rows, cols)).astype(np.float32)
    return depths, normals, colors, P, np.full((V,), f, np.float32)


def _sorted(pts):
    if len(pts) == 0:
        return pts
    order = np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))
    return pts[order]


@pytest.mark.parametrize("seed,bad_views,num_consistent", [
    (0, (), 1),
    (1, (), 2),
    (2, (3,), 2),   # one disagreeing view: its contribution must vanish
    (3, (1, 2), 1),
])
def test_fusion_cpp_matches_cuda_oracle(seed, bad_views, num_consistent):
    depths, normals, colors, P, focals = _make_scene(seed,
                                                     bad_views=bad_views)
    disp_thresh, normal_thresh = 0.25, 0.52
    golden = _oracle(depths, normals, P, focals, colors, disp_thresh,
                     normal_thresh, num_consistent)
    got = F.fuse_depth_maps(depths, normals, P, focals, colors=colors,
                            disp_thresh=disp_thresh,
                            normal_thresh=normal_thresh,
                            num_consistent=num_consistent)
    assert got.shape[0] == golden.shape[0], (
        f"point count {got.shape[0]} != oracle {golden.shape[0]}")
    if len(golden):
        np.testing.assert_allclose(_sorted(np.asarray(got, np.float64)),
                                   _sorted(golden), atol=2e-3, rtol=1e-4)


def test_fusion_rejects_all_when_views_disagree():
    """Every non-ref view disagreeing → no point reaches num_consistent=1."""
    depths, normals, colors, P, focals = _make_scene(5, bad_views=(1, 2, 3))
    # make view 0 the only coherent one; with all others scaled away no
    # cross-view pair agrees (bad views were scaled by DIFFERENT random
    # factors per pixel)
    got = F.fuse_depth_maps(depths, normals, P, focals, colors=colors,
                            disp_thresh=0.05, normal_thresh=0.52,
                            num_consistent=2)
    golden = _oracle(depths, normals, P, focals, colors, 0.05, 0.52, 2)
    assert got.shape[0] == golden.shape[0]
