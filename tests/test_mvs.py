"""MVS subsystem tests: homography parity vs a torch re-statement, DCN
degenerate-case parity with a plain conv, FMT/CostRegNet shapes, full
TransMVSNet forward + loss + gradient smoke."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from diner_tpu.mvs.homography import homo_warping
from diner_tpu.mvs.model import (
    CostRegNet,
    FeatureNet,
    TransMVSNet,
    TransMVSNetConfig,
    get_depth_range_samples,
    depth_wta,
)
from diner_tpu.mvs.fmt import FMTWithPathway, sine_position_encoding_2d
from diner_tpu.mvs.loss import entropy_loss, trans_mvsnet_loss


def _torch_homo_warping(src_fea, src_proj, ref_proj, depth_values):
    """Re-statement of reference homo_warping (module.py:284-322)."""
    src_fea = torch.from_numpy(np.transpose(src_fea, (0, 3, 1, 2)))
    src_proj = torch.from_numpy(src_proj)
    ref_proj = torch.from_numpy(ref_proj)
    depth_values = torch.from_numpy(depth_values)
    batch, channels = src_fea.shape[0], src_fea.shape[1]
    num_depth = depth_values.shape[1]
    height, width = src_fea.shape[2], src_fea.shape[3]
    proj = torch.matmul(src_proj, torch.inverse(ref_proj))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3:4]
    y, x = torch.meshgrid(torch.arange(0, height, dtype=torch.float32),
                          torch.arange(0, width, dtype=torch.float32),
                          indexing="ij")
    y, x = y.reshape(-1), x.reshape(-1)
    xyz = torch.stack((x, y, torch.ones_like(x)))[None].repeat(batch, 1, 1)
    rot_xyz = torch.matmul(rot, xyz)
    rot_depth_xyz = rot_xyz.unsqueeze(2).repeat(1, 1, num_depth, 1) * \
        depth_values.view(batch, 1, num_depth, -1)
    proj_xyz = rot_depth_xyz + trans.view(batch, 3, 1, 1)
    invalid = (proj_xyz[:, 2:3] < 1e-6).squeeze(1)
    proj_xy = proj_xyz[:, :2] / proj_xyz[:, 2:3]
    px = proj_xy[:, 0] / ((width - 1) / 2) - 1
    px[invalid] = -99.0
    py = proj_xy[:, 1] / ((height - 1) / 2) - 1
    py[invalid] = -99.0
    grid = torch.stack((px, py), dim=3)
    warped = F.grid_sample(src_fea, grid.view(batch, num_depth * height,
                                              width, 2),
                           mode="bilinear", padding_mode="zeros",
                           align_corners=True)
    return warped.view(batch, channels, num_depth, height,
                       width).numpy()


def test_homo_warping_matches_reference():
    rng = np.random.RandomState(0)
    B, H, W, C, D = 2, 12, 16, 5, 7
    src_fea = rng.randn(B, H, W, C).astype(np.float32)
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)

    def proj(tx):
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K
        P[0, 3] = tx
        return np.tile(P, (B, 1, 1))

    src_proj = proj(2.0)
    ref_proj = proj(0.0)
    depth_values = np.tile(
        np.linspace(1.0, 3.0, D, dtype=np.float32)[None, :, None],
        (B, 1, H * W))

    ours = np.asarray(homo_warping(jnp.asarray(src_fea),
                                   jnp.asarray(src_proj),
                                   jnp.asarray(ref_proj),
                                   jnp.asarray(depth_values)))
    ref = _torch_homo_warping(src_fea, src_proj, ref_proj,
                              depth_values.reshape(B, D, H, W))
    # ours (B, D, H, W, C) vs ref (B, C, D, H, W)
    np.testing.assert_allclose(np.transpose(ours, (0, 4, 1, 2, 3)), ref,
                               atol=2e-4, rtol=1e-4)


def test_dcn_zero_offsets_equals_plain_conv():
    """With zero offset/mask conv output, DCNv2 reduces to a standard conv
    with 0.5 modulation (sigmoid(0)); verify against torch conv2d."""
    from diner_tpu.mvs.dcn import DeformConv2d

    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 12, 4).astype(np.float32)
    m = DeformConv2d(features=6)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(m.apply(variables, jnp.asarray(x)))

    kernel = np.asarray(variables["params"]["kernel"])  # (K*C, O)
    bias = np.asarray(variables["params"]["bias"])
    # reassemble as torch conv weight (O, C, kh, kw): rows are k-major, C
    w = kernel.reshape(9, 4, 6).transpose(2, 1, 0).reshape(6, 4, 3, 3)
    ref = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                   torch.from_numpy(w), torch.from_numpy(bias),
                   padding=1).numpy() * 1.0
    # modulation mask sigmoid(0)=0.5 applies inside the tap sum
    ref = 0.5 * (ref - bias[None, :, None, None]) + bias[None, :, None, None]
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref,
                               atol=1e-4, rtol=1e-4)


def test_depth_range_samples():
    B, H, W = 2, 6, 8
    # stage-1 path: global range
    dv = np.tile(np.linspace(2.0, 10.0, 16, dtype=np.float32)[None], (2, 1))
    out = np.asarray(get_depth_range_samples(jnp.asarray(dv), 16, 1.0,
                                             (B, H, W)))
    assert out.shape == (B, 16, H, W)
    np.testing.assert_allclose(out[0, :, 0, 0], dv[0], atol=1e-5)
    # refinement path: around prior depth
    prior = np.full((B, H, W), 5.0, np.float32)
    out = np.asarray(get_depth_range_samples(jnp.asarray(prior), 8, 0.5,
                                             (B, H, W)))
    assert out.shape == (B, 8, H, W)
    np.testing.assert_allclose(out[:, 0], 5.0 - 4 * 0.5, atol=1e-5)
    np.testing.assert_allclose(out[:, -1], 5.0 + 4 * 0.5, atol=1e-5)


def test_sine_pe_matches_reference():
    import math
    d_model, H, W = 8, 5, 6
    pe = np.asarray(sine_position_encoding_2d(d_model, H, W))
    # reference formula check at a few positions (positions start at 1)
    div = np.exp(np.arange(0, d_model // 2, 2) *
                 (-math.log(10000.0) / (d_model // 2)))
    np.testing.assert_allclose(pe[2, 3, 0], np.sin(4 * div[0]), atol=1e-6)
    np.testing.assert_allclose(pe[2, 3, 2], np.sin(3 * div[0]), atol=1e-6)
    np.testing.assert_allclose(pe[2, 3, 3], np.cos(3 * div[0]), atol=1e-6)


@pytest.mark.slow
def test_transmvsnet_forward_and_loss():
    # ndepths must be divisible by the 3-D UNet's 8x downsampling, as in
    # the reference configs (48/32/8, 96/64/16)
    cfg = TransMVSNetConfig(ndepths=(8, 8, 8), cr_base_chs=(4, 4, 4),
                            base_channels=4)
    model = TransMVSNet(cfg=cfg)
    rng = np.random.RandomState(2)
    B, V, H, W = 1, 3, 32, 32
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))

    K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]], np.float32)
    projs = {}
    for s, scale in [("stage1", 4), ("stage2", 2), ("stage3", 1)]:
        pm = np.zeros((B, V, 2, 4, 4), np.float32)
        for v in range(V):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = 0.1 * v
            Ks = np.eye(4, dtype=np.float32)
            Ks[:3, :3] = K.copy()
            Ks[:2] /= scale
            pm[:, v, 0] = E
            pm[:, v, 1] = Ks
        projs[s] = jnp.asarray(pm)
    depth_values = jnp.asarray(
        np.tile(np.linspace(2.0, 6.0, 48, dtype=np.float32)[None], (B, 1)))

    variables = model.init(jax.random.PRNGKey(0), imgs, projs, depth_values,
                           train=False)
    out = model.apply(variables, imgs, projs, depth_values, train=False)
    assert out["stage1"]["depth"].shape == (B, H // 4, W // 4)
    assert out["stage2"]["depth"].shape == (B, H // 2, W // 2)
    assert out["stage3"]["depth"].shape == (B, H, W)
    assert np.isfinite(np.asarray(out["depth"])).all()
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1).all()
    d = np.asarray(out["depth"])
    # refinement stages re-center hypothesis windows around the prior and
    # may overshoot the global range by up to ndepth/2 * ratio * interval
    # (the reference has the same behavior — no clamping)
    margin = 8 / 2 * 4 * (6.0 - 2.0) / 48
    assert (d >= 2.0 - margin).all() and (d <= 6.0 + margin).all()

    # loss + gradient smoke
    gt = {s: jnp.asarray(np.full((B, H // k, W // k), 4.0, np.float32))
          for s, k in [("stage1", 4), ("stage2", 2), ("stage3", 1)]}
    mask = {s: jnp.ones_like(v) for s, v in gt.items()}

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        imgs, projs, depth_values, train=False)
        total, dl, te, _ = trans_mvsnet_loss(o, gt, mask,
                                             dlossw=[0.5, 1.0, 2.0])
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g ** 2))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_entropy_loss_matches_reference():
    rng = np.random.RandomState(3)
    B, D, H, W = 2, 6, 5, 7
    logits = rng.randn(B, D, H, W).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    dv = np.tile(np.linspace(1, 4, D, dtype=np.float32)[None], (B, 1))
    gt = rng.uniform(1, 4, (B, H, W)).astype(np.float32)
    mask = (rng.rand(B, H, W) > 0.3)

    ours_loss, ours_wta = entropy_loss(jnp.asarray(prob), jnp.asarray(gt),
                                       jnp.asarray(mask), jnp.asarray(dv))

    # torch re-statement (module.py:490-526)
    pt = torch.from_numpy(prob)
    dvm = torch.from_numpy(dv).repeat(H, W, 1, 1).permute(2, 3, 0, 1)
    gtt = torch.from_numpy(gt)
    mt = torch.from_numpy(mask.astype(np.float32))
    gt_idx = torch.argmin(torch.abs(dvm - gtt.unsqueeze(1)), dim=1)
    gt_idx = torch.round(mt * gt_idx.float()).long().unsqueeze(1)
    onehot = torch.zeros(B, D, H, W).scatter_(1, gt_idx, 1)
    ce = -torch.sum(onehot * torch.log(pt + 1e-6), dim=1)
    valid = mt.sum(dim=[1, 2]) + 1e-6
    ref_loss = torch.mean((mt * ce).sum(dim=[1, 2]) / valid)
    wta_idx = torch.argmax(pt, dim=1, keepdim=True)
    ref_wta = torch.gather(dvm, 1, wta_idx).squeeze(1)

    np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_wta), ref_wta.numpy(),
                               atol=1e-6)


@pytest.mark.slow
def test_featurenet_view_batching_matches_per_view():
    """The batched (B*V) FeatureNet call must equal the reference's
    per-view loop exactly with frozen BN stats (model.py view batching)."""
    from diner_tpu.mvs.model import FeatureNet

    rng = np.random.RandomState(7)
    B, V, H, W = 2, 3, 32, 32
    imgs = jnp.asarray(rng.rand(B, V, H, W, 3).astype(np.float32))
    net = FeatureNet(base_channels=4)
    variables = net.init(jax.random.PRNGKey(0), imgs[:, 0], train=False)

    batched = net.apply(variables, imgs.reshape(B * V, H, W, 3), train=False)
    for v in range(V):
        per_view = net.apply(variables, imgs[:, v], train=False)
        for stage, f in batched.items():
            np.testing.assert_allclose(
                np.asarray(f.reshape((B, V) + f.shape[1:])[:, v]),
                np.asarray(per_view[stage]), rtol=1e-6, atol=1e-6)


def test_superglue_pe_matches_true_reference():
    """PositionEncodingSuperGlue == the reference's own module
    (deps/TransMVSNet/models/position_encoding.py:6-21), weights converted
    from the instantiated torch module, eval-mode BN."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_position_encoding",
        "/root/reference/deps/TransMVSNet/models/position_encoding.py")
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    torch.manual_seed(0)
    d_model = 32
    ref = ref_mod.PositionEncodingSuperGule(d_model)
    ref.eval()

    N, H, W = 2, 12, 16
    x = np.random.RandomState(0).randn(N, d_model, H, W).astype(np.float32)
    out_ref = ref(torch.from_numpy(x)).detach().numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"][:, :, 0].T,
                "bias": sd[prefix + ".bias"]}

    def bn(prefix):
        return ({"scale": sd[prefix + ".weight"],
                 "bias": sd[prefix + ".bias"]},
                {"mean": sd[prefix + ".running_mean"],
                 "var": sd[prefix + ".running_var"]})

    bn0_p, bn0_s = bn("kenc.encoder.1")
    bn1_p, bn1_s = bn("kenc.encoder.4")
    variables = {
        "params": {"mlp_0": lin("kenc.encoder.0"), "bn_0": bn0_p,
                   "mlp_1": lin("kenc.encoder.3"), "bn_1": bn1_p,
                   "mlp_out": lin("kenc.encoder.6")},
        "batch_stats": {"bn_0": bn0_s, "bn_1": bn1_s},
    }

    from diner_tpu.mvs.fmt import PositionEncodingSuperGlue

    ours = PositionEncodingSuperGlue(d_model)
    out_j = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out_j = np.transpose(np.asarray(out_j), (0, 3, 1, 2))
    np.testing.assert_allclose(out_j, out_ref, atol=1e-5, rtol=1e-5)


def test_fmt_superglue_pe_switch():
    """FMTWithPathway(pe_type='superglue') initializes and runs."""
    from diner_tpu.mvs.fmt import FMT

    fmt = FMT(d_model=8, n_heads=2, pe_type="superglue")
    x = jnp.ones((1, 4, 6, 8))
    variables = fmt.init(jax.random.PRNGKey(0), x)
    outs = fmt.apply(variables, x)
    assert len(outs) == 4 and outs[0].shape == x.shape


@pytest.mark.slow
def test_remat_and_bf16_modes_run_and_match():
    """remat=True must be numerically identical to remat=False (same params,
    same inputs) — rematerialization only changes what backward recomputes."""
    from diner_tpu.mvs.model import TransMVSNet, TransMVSNetConfig

    V, H, W = 2, 32, 32
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, V, H, W, 3), jnp.float32)
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                    np.float32)
    extr = np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
    extr[1, 0, 3] = 0.1
    proj = {}
    for si, scale in enumerate([0.25, 0.5, 1.0]):
        P = np.zeros((1, V, 2, 4, 4), np.float32)
        for v in range(V):
            P[0, v, 0] = extr[v]
            K = intr.copy()
            K[:2] *= scale
            P[0, v, 1, :3, :3] = K
        proj[f"stage{si + 1}"] = jnp.asarray(P)
    dvals = jnp.linspace(0.5, 1.5, 48)[None].astype(jnp.float32)

    cfg = TransMVSNetConfig(ndepths=(8, 8, 8))
    base = TransMVSNet(cfg=cfg)
    variables = base.init(jax.random.PRNGKey(0), imgs, proj, dvals,
                          train=False)
    out0 = base.apply(variables, imgs, proj, dvals, train=False)

    rem = TransMVSNet(cfg=TransMVSNetConfig(ndepths=(8, 8, 8), remat=True))
    out1 = rem.apply(variables, imgs, proj, dvals, train=False)
    np.testing.assert_allclose(np.asarray(out1["depth"]),
                               np.asarray(out0["depth"]), atol=1e-5)

    # remat grads == plain grads
    def loss(m, v):
        o = m.apply(v, imgs, proj, dvals, train=False)
        return jnp.mean(o["prob_volume"])
    g0 = jax.grad(lambda v: loss(base, v))(variables)["params"]
    g1 = jax.grad(lambda v: loss(rem, v))(variables)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-5),
        g0, g1)

    # selective remat (FeatureNet resident, sweep+CostRegNet rematted)
    # is also grad-identical
    sel = TransMVSNet(cfg=TransMVSNetConfig(ndepths=(8, 8, 8), remat=True,
                                            remat_feature=False))
    g2 = jax.grad(lambda v: loss(sel, v))(variables)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-5),
        g0, g2)

    # bf16 path runs and stays finite
    bf = TransMVSNet(cfg=TransMVSNetConfig(ndepths=(8, 8, 8), remat=True),
                     dtype=jnp.bfloat16)
    vbf = bf.init(jax.random.PRNGKey(0), imgs, proj, dvals, train=False)
    outb = bf.apply(vbf, imgs, proj, dvals, train=False)
    assert np.isfinite(np.asarray(outb["depth"])).all()


@pytest.mark.slow  # 83 s — the fast tier's single biggest cost (r5 re-tier)
def test_sweep_chunk_parity():
    """The multi-chunk plane-sweep scan (D > sweep_chunk — the production
    48/32 depth stages) must match the single-chunk path bit-for-bit;
    every other test collapses to one chunk via ndepths=(8,8,8)."""
    from diner_tpu.mvs.model import TransMVSNet, TransMVSNetConfig

    V, H, W = 2, 32, 32
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(1, V, H, W, 3), jnp.float32)
    intr = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                    np.float32)
    extr = np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
    extr[1, 0, 3] = 0.1
    proj = {}
    for si, scale in enumerate([0.25, 0.5, 1.0]):
        P = np.zeros((1, V, 2, 4, 4), np.float32)
        for v in range(V):
            P[0, v, 0] = extr[v]
            K = intr.copy()
            K[:2] *= scale
            P[0, v, 1, :3, :3] = K
        proj[f"stage{si + 1}"] = jnp.asarray(P)
    dvals = jnp.linspace(0.5, 1.5, 48)[None].astype(jnp.float32)

    cfg1 = TransMVSNetConfig(ndepths=(16, 8, 8), sweep_chunk=16)
    one = TransMVSNet(cfg=cfg1)
    variables = one.init(jax.random.PRNGKey(0), imgs, proj, dvals,
                         train=False)
    out1 = one.apply(variables, imgs, proj, dvals, train=False)

    chunked = TransMVSNet(
        cfg=TransMVSNetConfig(ndepths=(16, 8, 8), sweep_chunk=4))
    out4 = chunked.apply(variables, imgs, proj, dvals, train=False)

    for k in ("depth", "photometric_confidence", "prob_volume"):
        np.testing.assert_array_equal(np.asarray(out1[k]),
                                      np.asarray(out4[k]))


@pytest.mark.parametrize("W", [9, 8])
def test_bilinear_sample_pix_custom_vjp_matches_autodiff(W):
    """The hand-written DCN sampler VJP (x-paired corner scatter for even
    W — the full-res FeatureNet backward hot path — and the per-corner
    fallback for odd W) must match autodiff of the reference
    implementation for ALL cotangents: img, x, y, scale."""
    import diner_tpu.mvs.dcn as dcn_mod
    from diner_tpu.mvs.dcn import _bilinear_sample_pix, bilinear_sample_pix_ref

    def bilinear_sample_pix(img, x, y, scale=None):
        return _bilinear_sample_pix(img, x, y, scale)

    rng = np.random.RandomState(0)
    N, H, C, P = 2, 7, 5, 33
    img = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    # positions straddling borders, outside, and exact integers
    x = jnp.asarray(rng.uniform(-2.0, W + 1.0, (N, P)), jnp.float32)
    y = jnp.asarray(rng.uniform(-2.0, H + 1.0, (N, P)), jnp.float32)
    x = x.at[:, 0].set(3.0)
    y = y.at[:, 0].set(2.0)
    scale = jnp.asarray(rng.uniform(0.0, 1.0, (N, P)), jnp.float32)
    g = jnp.asarray(rng.randn(N, P, C), jnp.float32)

    def run(fn):
        def f(img, x, y, scale):
            return jnp.vdot(fn(img, x, y, scale), g)
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
            img, x, y, scale)
        return val, grads

    v_ref, g_ref = run(bilinear_sample_pix_ref)
    v_new, g_new = run(bilinear_sample_pix)
    np.testing.assert_allclose(float(v_new), float(v_ref), rtol=1e-6)
    for a, b, name in zip(g_new, g_ref, ("img", "x", "y", "scale")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)

    # forward parity too (flat take vs take_along_axis)
    o_ref = bilinear_sample_pix_ref(img, x, y, scale)
    o_new = bilinear_sample_pix(img, x, y, scale)
    np.testing.assert_allclose(np.asarray(o_new), np.asarray(o_ref),
                               rtol=1e-6, atol=1e-6)

    # scale=None path
    o2r = bilinear_sample_pix_ref(img, x, y)
    o2n = bilinear_sample_pix(img, x, y)
    np.testing.assert_allclose(np.asarray(o2n), np.asarray(o2r),
                               rtol=1e-6, atol=1e-6)
