"""True-reference parity for the §2.5 tensor utilities: runs the ACTUAL
``src/util/torch_helpers.py`` and ``src/util/depth2normal.py`` from
``/root/reference`` (via tests/ref_shims.py) as the oracle for the
framework's analytic implementations.

Covers:
  - exponential-padding grid_sample (torch_helpers.py:100-160), on the
    exact configuration the encoder's ``index_depth_std`` uses
    (pad 100, double_width 12, nearest, zeros outside) — the reference
    materializes a (H+200)×(W+200) canvas; the framework computes the pad
    factor analytically (SURVEY §7 hard part 1);
  - plain border/zeros nearest + bilinear modes of the same wrapper;
  - weighted_mean_n_std (torch_helpers.py:294-302);
  - masked_downsampling average/nearest (torch_helpers.py:241-291);
  - depth2normal (depth2normal.py:7-87) including zero-depth boundary
    cleanup.
"""

import numpy as np
import torch
import jax.numpy as jnp

from tests import ref_shims

ref_shims.install()

from src.util import torch_helpers as TH  # noqa: E402  (actual reference)
from src.util.depth2normal import depth2normal as ref_depth2normal  # noqa: E402

from diner_tpu.geometry.normals import depth_to_normal  # noqa: E402
from diner_tpu.ops.grid_sample import (  # noqa: E402
    grid_sample,
    grid_sample_bilinear,
    grid_sample_exponential_nearest,
    grid_sample_nearest,
)
from diner_tpu.ops.sampling import weighted_mean_std  # noqa: E402
from diner_tpu.preprocessing.facescape import (  # noqa: E402
    masked_downsampling,
)


def _mk_img(N=2, C=1, H=9, W=11, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(N, C, H, W).astype(np.float32) + 0.1
    return img


def _mk_uv(N=2, P=257, seed=1, lo=-2.2, hi=2.2):
    rng = np.random.RandomState(seed)
    return (rng.rand(N, P, 2) * (hi - lo) + lo).astype(np.float32)


def test_exponential_grid_sample_matches_reference_torch_helpers():
    """Our analytic exponential-nearest == the reference's materialized
    padded-canvas path at the index_depth_std configuration."""
    img = _mk_img()
    uv = _mk_uv()  # includes points far outside the image
    ref = TH.grid_sample(
        torch.from_numpy(img), torch.from_numpy(uv).unsqueeze(2),
        mode="nearest", padding_mode="exponential", align_corners=False,
        pad_double_width=12, pad_size=100, exp_padding_mode="zeros",
    )[:, :, :, 0].numpy()  # (N, C, P)

    ours = grid_sample_exponential_nearest(
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))), jnp.asarray(uv),
        pad_size=100, double_width=12.0)  # (N, P, C)
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 2, 1)),
                               ref, atol=1e-5, rtol=1e-5)

    # the dispatching wrapper routes identically
    ours2 = grid_sample(jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                        jnp.asarray(uv), mode="nearest",
                        padding_mode="exponential", pad_size=100,
                        double_width=12.0)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ours))


def test_plain_grid_sample_modes_match_reference_wrapper():
    img = _mk_img(C=3)
    uv = _mk_uv(lo=-1.3, hi=1.3)
    timg = torch.from_numpy(img)
    tuv = torch.from_numpy(uv).unsqueeze(2)
    jimg = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    juv = jnp.asarray(uv)

    for mode, pad, fn in (
            ("nearest", "border", grid_sample_nearest),
            ("nearest", "zeros", grid_sample_nearest),
            ("bilinear", "border", grid_sample_bilinear),
            ("bilinear", "zeros", grid_sample_bilinear)):
        ref = TH.grid_sample(timg, tuv, mode=mode, padding_mode=pad,
                             align_corners=False)[:, :, :, 0].numpy()
        ours = np.transpose(np.asarray(fn(jimg, juv, pad)), (0, 2, 1))
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5,
                                   err_msg=f"{mode}/{pad}")


def test_weighted_mean_n_std_matches_reference():
    rng = np.random.RandomState(2)
    x = rng.rand(4, 50).astype(np.float32)
    w = rng.rand(4, 50).astype(np.float32)
    m_ref, s_ref = TH.weighted_mean_n_std(torch.from_numpy(x),
                                          torch.from_numpy(w), dim=-1,
                                          keepdims=True)
    m, s = weighted_mean_std(jnp.asarray(x), jnp.asarray(w), axis=-1,
                             keepdims=True)
    np.testing.assert_allclose(np.asarray(m), m_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), s_ref.numpy(), atol=1e-5)


def test_masked_downsampling_matches_reference():
    rng = np.random.RandomState(3)
    H = W = 12
    x = rng.rand(3, H, W).astype(np.float32)
    mask = (rng.rand(1, H, W) > 0.4).astype(np.float32)
    for mode in ("average", "nearest"):
        ref = TH.masked_downsampling(torch.from_numpy(x.copy()),
                                     torch.from_numpy(mask.copy()),
                                     factor=4, mode=mode,
                                     bg_color=0.25).numpy()  # (C, h, w)
        ours = masked_downsampling(np.transpose(x, (1, 2, 0)),
                                   np.transpose(mask, (1, 2, 0)),
                                   factor=4, mode=mode, bg_color=0.25)
        np.testing.assert_allclose(np.transpose(ours, (2, 0, 1)), ref,
                                   atol=1e-5, err_msg=mode)


def test_depth2normal_matches_reference_module():
    rng = np.random.RandomState(4)
    N, H, W = 2, 16, 20
    depth = (1.0 + rng.rand(N, H, W)).astype(np.float32)
    depth[0, :5, :6] = 0.0  # invalid region exercises the boundary cleanup
    intr = np.array([[[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1]]] * N,
                    np.float32)
    ref = ref_depth2normal(torch.from_numpy(depth)[:, None],
                           torch.from_numpy(intr))  # (N, 3, H, W)
    ours = depth_to_normal(jnp.asarray(depth), jnp.asarray(intr))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(ref.numpy(), (0, 2, 3, 1)),
        atol=1e-4, rtol=1e-4)


def test_gen_rays_matches_reference_cam_geometry():
    """Framework gen_rays == the actual reference src/util/cam_geometry.py
    gen_rays (half-pixel OpenCV convention, normalized world dirs,
    origins from -R^T t, (B,H,W,8) packing)."""
    from src.util.cam_geometry import gen_rays as ref_gen_rays
    from diner_tpu.geometry import gen_rays

    rng = np.random.RandomState(5)
    B, H, W = 2, 6, 7
    extr = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    for b in range(B):
        a = 0.2 + 0.1 * b
        c, s = np.cos(a), np.sin(a)
        extr[b, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                   np.float32)
        extr[b, :3, 3] = rng.randn(3).astype(np.float32) * 0.2
    intr = np.tile(np.array([[9.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]],
                            np.float32), (B, 1, 1))
    znear = np.array([0.7, 0.8], np.float32)
    zfar = np.array([2.0, 2.2], np.float32)

    ref = ref_gen_rays(torch.from_numpy(extr), torch.from_numpy(intr), W, H,
                       torch.from_numpy(znear), torch.from_numpy(zfar))
    ours = gen_rays(jnp.asarray(extr), jnp.asarray(intr), W, H,
                    jnp.asarray(znear), jnp.asarray(zfar))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_antibias_loss_matches_reference():
    """AntibiasLoss (avg-pool 2^n then L1) vs the actual reference module."""
    # load the module file directly: the reference's src/losses/__init__.py
    # imports a non-existent bgnllloss (fork defect)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_antibiasloss", "/root/reference/src/losses/antibiasloss.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    AntibiasLoss = mod.AntibiasLoss
    from diner_tpu.losses import antibias_loss

    rng = np.random.RandomState(6)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.rand(2, 32, 32, 3).astype(np.float32)
    ref = AntibiasLoss(3)(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                          torch.from_numpy(np.transpose(y, (0, 3, 1, 2))))
    ours = antibias_loss(jnp.asarray(x), jnp.asarray(y), 3)
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-6)


def test_novel_deform_points_matches_reference_renderer():
    """NOVEL mesh-offset deformation (kNN K=1 to target vertices, add that
    vertex's offset) vs the ACTUAL reference
    src/models/novel/nerf_novel_renderer.py deform_points (:40-50), with
    pytorch3d.knn_points shimmed as brute-force cdist+top-1."""
    from src.models.novel.nerf_novel_renderer import (
        NeRFRendererDGS as RefNovelRenderer,
    )
    from diner_tpu.ops.knn import deform_points

    rng = np.random.RandomState(7)
    SB, B, NV = 2, 123, 310
    pts = rng.randn(SB, B, 3).astype(np.float32)
    verts = rng.randn(SB, NV, 3).astype(np.float32)
    offs = rng.randn(SB, NV, 3).astype(np.float32) * 0.1

    ref = RefNovelRenderer().deform_points(
        torch.from_numpy(pts), torch.from_numpy(verts),
        torch.from_numpy(offs)).numpy()
    ours = deform_points(jnp.asarray(pts), jnp.asarray(verts),
                         jnp.asarray(offs))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_rel_z_decay_matches_reference_spatial_encoder():
    """KeypointNeRF rel_z_decay keypoint encoding vs the ACTUAL reference
    src/models/spatial_encoder.py forward (:108-117)."""
    from src.models.spatial_encoder import SpatialEncoder as RefSpEnc
    from diner_tpu.models.keypointnerf.modules import rel_z_decay_encoding

    rng = np.random.RandomState(8)
    B, V, N, K = 1, 2, 37, 13
    sp_level, scale, sigma = 3, 10.0, 0.8
    v_world = rng.randn(B * V, N, 3).astype(np.float32)
    kpt3d = rng.randn(B, K, 3).astype(np.float32)
    extrin = np.tile(np.eye(4, dtype=np.float32), (B * V, 1, 1))
    for i in range(B * V):
        a = 0.3 * i
        c, s = np.cos(a), np.sin(a)
        extrin[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                                     np.float32)
        extrin[i, :3, 3] = rng.randn(3).astype(np.float32) * 0.1

    enc = RefSpEnc(sp_level=sp_level, sp_type="rel_z_decay", scale=scale,
                   n_kpt=K, sigma=sigma)
    sp_data = dict(
        KRT=torch.zeros(B * V, 3, 4), n_view=V,
        v=torch.from_numpy(v_world), pts=torch.from_numpy(v_world[:B]),
        z=torch.zeros(B * V, N, 1), xy=torch.zeros(B * V, N, 2),
        extrin=torch.from_numpy(extrin), kpt3d=torch.from_numpy(kpt3d))
    ref = enc(**sp_data).numpy()

    # camera-space inputs for the framework function
    R = extrin[:, :3, :3]
    t = extrin[:, :3, 3]
    cxyz = np.einsum("bij,bnj->bni", R, v_world) + t[:, None]
    kpt_rep = np.repeat(kpt3d, V, axis=0)  # (B*V, K, 3)
    kpt_cam = np.einsum("bij,bkj->bki", R, kpt_rep) + t[:, None]
    ours = rel_z_decay_encoding(jnp.asarray(cxyz), jnp.asarray(kpt_cam),
                                sp_level, scale, sigma)
    assert ours.shape == ref.shape == (B * V, N, (1 + 2 * sp_level) * K)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=2e-5)


def test_pix_loss_matches_reference_keypointnerf_util():
    """pix_loss family (l1/l2/lp/top-k%) vs the ACTUAL reference
    src/util/keypointnerf_util.py:202-231."""
    from src.util.keypointnerf_util import pix_loss as ref_pix_loss
    from diner_tpu.models.keypointnerf.losses import pix_loss

    rng = np.random.RandomState(9)
    B, C, H, W = 2, 3, 8, 10
    src = rng.rand(B, C, H, W).astype(np.float32)
    tar = rng.rand(B, C, H, W).astype(np.float32)
    w = {"l1": 0.5, "l2": 1.0, "lp": 0.2, "l1top20": 1.0, "l2top50": 0.7}
    ref = ref_pix_loss(torch.from_numpy(src), torch.from_numpy(tar), w)
    ours = pix_loss(jnp.asarray(np.transpose(src, (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(tar, (0, 2, 3, 1))), w)
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   atol=1e-6, rtol=1e-5, err_msg=k)
