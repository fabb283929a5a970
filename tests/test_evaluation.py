"""Evaluation-suite tests: SSIM vs a torch re-statement of the skimage
algorithm, PSNR sanity, LPIPS-proxy behavior, folder protocol round trip."""

import json

import numpy as np
import torch
import torch.nn.functional as F

from diner_tpu.evaluation import (
    evaluate_folder,
    init_lpips_proxy,
    l1,
    lpips_distance,
    mse,
    psnr,
    ssim,
)


def _torch_ssim_skimage(x, y, data_range=1.0, win=7):
    """Re-statement of skimage.structural_similarity (uniform window,
    reflect padding, sample covariance, edge crop) per channel."""
    def filt(a):
        pad = win // 2
        a = torch.from_numpy(a)[None, None].double()
        a = F.pad(a, [pad] * 4, mode="reflect")
        k = torch.ones(1, 1, win, win, dtype=torch.float64) / (win * win)
        return F.conv2d(a, k)[0, 0].numpy()

    NP = win * win
    cov_norm = NP / (NP - 1)
    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        ux, uy = filt(xc), filt(yc)
        vx = cov_norm * (filt(xc * xc) - ux * ux)
        vy = cov_norm * (filt(yc * yc) - uy * uy)
        vxy = cov_norm * (filt(xc * yc) - ux * uy)
        C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
        pad = (win - 1) // 2
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def test_ssim_matches_skimage_algorithm():
    rng = np.random.RandomState(0)
    x = rng.rand(32, 36, 3).astype(np.float32)
    y = np.clip(x + rng.randn(32, 36, 3).astype(np.float32) * 0.1, 0, 1)
    ours = ssim(x, y)
    ref = _torch_ssim_skimage(x, y)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    assert ssim(x, x) > 0.9999


def test_psnr_l1_l2():
    x = np.zeros((8, 8, 3))
    y = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(x, y), 20.0, atol=1e-6)
    np.testing.assert_allclose(mse(x, y), 0.01, atol=1e-9)
    np.testing.assert_allclose(l1(x, y), 0.1, atol=1e-9)


def test_lpips_proxy_properties():
    params = init_lpips_proxy()
    rng = np.random.RandomState(1)
    import jax.numpy as jnp
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    b = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    d_ab = float(np.asarray(lpips_distance(params, a, b))[0])
    d_aa = float(np.asarray(lpips_distance(params, a, a))[0])
    assert d_aa == 0.0
    assert d_ab > 0.0


def test_evaluate_folder_protocol(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(2)
    vis = tmp_path / "vis"
    vis.mkdir()
    for i in range(3):
        gt = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
        noise = rng.randn(24, 24, 3) * 10
        pred = np.clip(gt.astype(float) + noise, 0, 255).astype(np.uint8)
        imageio.imwrite(vis / f"s{i:03d}-gt.png", gt)
        imageio.imwrite(vis / f"s{i:03d}-pred.png", pred)
        imageio.imwrite(vis / f"s{i:03d}-ref.png",
                        np.concatenate([gt, gt], axis=1))
        imageio.imwrite(vis / f"s{i:03d}-depth.png", gt)

    out = tmp_path / "scores"
    avg = evaluate_folder(vis, out, lpips_params="proxy")
    assert set(avg) == {"ssim", "psnr", "l1", "l2", "lpips_proxy"}
    assert avg["psnr"] > 20
    with open(out / "average_scores.json") as f:
        report = json.load(f)
        # proxy runs are labeled in the written report (not comparable
        # to reference LPIPS ranges — docs/PRETRAINED.md)
        assert "proxy" in report.pop("lpips_proxy_note")
        assert report == avg
    with open(out / "detailed_report.json") as f:
        detail = json.load(f)
    assert len(detail) == 3
    assert (out / "examples.png").exists()


def test_compare_evaluations_plots(tmp_path):
    """compare_evaluations writes the comparison JSON, the violin plot
    (reference eval_suite.py:141-199) and the biggest-difference error-map
    plots (:281-385) for reference-style (name, dir) inputs."""
    import imageio.v2 as imageio
    from diner_tpu.evaluation.suite import compare_evaluations

    rng = np.random.RandomState(3)
    eval_dirs = []
    for model, sigma in (("modelA", 5), ("modelB", 30)):
        vis = tmp_path / model / "vis"
        vis.mkdir(parents=True)
        g = np.random.RandomState(0)  # same gt across models
        for i in range(4):
            gt = (g.rand(16, 16, 3) * 255).astype(np.uint8)
            pred = np.clip(gt.astype(float) + rng.randn(16, 16, 3) * sigma,
                           0, 255).astype(np.uint8)
            imageio.imwrite(vis / f"s{i:03d}-gt.png", gt)
            imageio.imwrite(vis / f"s{i:03d}-pred.png", pred)
            imageio.imwrite(vis / f"s{i:03d}-ref.png", gt)
        out = tmp_path / model / "scores"
        evaluate_folder(vis, out, lpips_params=None)
        eval_dirs.append((model, out))

    cmp_dir = tmp_path / "cmp"
    result = compare_evaluations(eval_dirs, cmp_dir)
    assert result["best"]["psnr"] == "modelA"
    assert (cmp_dir / "comparison.json").exists()
    assert (cmp_dir / "average_scores.png").exists()
    assert (cmp_dir / "biggest_difference_psnr_1.png").exists()
    # plain-dir form still works
    result2 = compare_evaluations([d for _, d in eval_dirs], cmp_dir)
    assert set(result2["models"]) == {"scores"} or len(result2["models"]) >= 1
