"""Drop-in pretrained-weights path (docs/PRETRAINED.md).

The official weights cannot enter this zero-egress environment, so the
always-run test fabricates torch-format state dicts with the exact
torchvision / lpips key schemas, converts them through
``scripts/import_pretrained.py`` and asserts every consumer auto-activates.
A final test scores with the REAL official weights when someone has
dropped them in (skipped otherwise).
"""

import numpy as np
import pytest

from diner_tpu.evaluation.metrics import LPIPS_CHANNELS, _VGG16_CONVS
from diner_tpu.losses.vgg import _VGG19_CONVS
from diner_tpu.utils import pretrained as P


def _conv_sd(convs, prefix="features."):
    """torchvision `features.*` state dict for a VGG conv stack."""
    rng = np.random.RandomState(0)
    sd = {}
    c_in = 3
    for idx, ch in convs:
        sd[f"{prefix}{idx}.weight"] = rng.randn(
            ch, c_in, 3, 3).astype(np.float32) * 0.05
        sd[f"{prefix}{idx}.bias"] = rng.randn(ch).astype(np.float32) * 0.01
        c_in = ch
    return sd


def _resnet34_sd():
    import torch
    from tests.ref_shims import _ResNet
    torch.manual_seed(0)
    return {k: v.numpy() for k, v in _ResNet((3, 4, 6, 3)).state_dict().items()}


@pytest.fixture()
def weights_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("DINER_TPU_PRETRAINED", str(tmp_path))
    return tmp_path


def test_import_and_auto_activation(weights_dir):
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in _resnet34_sd().items()},
               weights_dir / "resnet34-b627a593.pth")
    torch.save({k: torch.from_numpy(v)
                for k, v in _conv_sd(_VGG19_CONVS).items()},
               weights_dir / "vgg19-dcbb9e9d.pth")
    torch.save({k: torch.from_numpy(v)
                for k, v in _conv_sd(_VGG16_CONVS).items()},
               weights_dir / "vgg16-397923af.pth")
    rng = np.random.RandomState(1)
    torch.save({f"lins.{i}.model.1.weight":
                torch.from_numpy(np.abs(rng.randn(1, c, 1, 1))
                                 .astype(np.float32))
                for i, c in enumerate(LPIPS_CHANNELS)},
               weights_dir / "lpips_vgg_v0.1.pth")

    from scripts.import_pretrained import main
    converted = main(["--weights-dir", str(weights_dir)])
    assert set(converted) == {P.RESNET34_NPZ, P.VGG19_NPZ, P.LPIPS_NPZ}

    # vgg19 loss auto-load round-trips and drives the loss
    vgg_params = P.load_vgg19_loss_params()
    assert vgg_params is not None
    from diner_tpu.losses.vgg import vgg_loss
    import jax.numpy as jnp
    a = jnp.ones((1, 64, 64, 3)) * 0.25
    b = jnp.ones((1, 64, 64, 3)) * 0.75
    assert float(vgg_loss(vgg_params, a, b)) > 0

    # lpips auto-resolution flips the metric name from proxy to real
    lp = P.lpips_params_or_proxy()
    assert lp != "proxy" and "lins" in lp

    from diner_tpu.evaluation.suite import evaluate_folder
    import imageio.v2 as imageio
    vis = weights_dir / "vis"
    vis.mkdir()
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    imageio.imwrite(vis / "0-gt.png", img)
    imageio.imwrite(vis / "0-pred.png", 255 - img)
    avg = evaluate_folder(vis, weights_dir / "scores")
    assert "lpips" in avg and "lpips_proxy" not in avg

    # resnet34 graft: RGB slice copied into the widened conv1, PE
    # channels keep their fresh init, deeper layers replaced wholesale
    pre = P.load_resnet34_variables()
    assert pre is not None
    k0 = np.asarray(pre["params"]["conv1"]["kernel"])  # (7, 7, 3, 64)

    def widen(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = widen(v)
            else:
                out[k] = np.full_like(np.asarray(v), 7.0, np.float32)
        return out

    variables = {"params": {"encoder": {"resnet": widen(pre["params"])}},
                 "batch_stats": {"encoder":
                                 {"resnet": widen(pre["batch_stats"])}}}
    variables["params"]["encoder"]["resnet"]["conv1"]["kernel"] = \
        np.full((7, 7, 21, 64), 7.0, np.float32)
    grafted = P.graft_resnet34(variables, pre)
    gk = np.asarray(
        grafted["params"]["encoder"]["resnet"]["conv1"]["kernel"])
    np.testing.assert_array_equal(gk[:, :, :3, :], k0)
    assert (gk[:, :, 3:, :] == 7.0).all()  # PE channels untouched
    bn = grafted["batch_stats"]["encoder"]["resnet"]["bn1"]["mean"]
    np.testing.assert_array_equal(
        np.asarray(bn), np.asarray(pre["batch_stats"]["bn1"]["mean"]))


def test_npz_tree_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6.0).reshape(2, 3)},
            "lins": (np.ones(3), np.zeros(2))}
    P.save_tree_npz(tmp_path / "t.npz", tree)
    back = P.load_tree_npz(tmp_path / "t.npz")
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    assert isinstance(back["lins"], tuple) and len(back["lins"]) == 2
    np.testing.assert_array_equal(back["lins"][0], tree["lins"][0])


@pytest.mark.skipif(
    not (P.pretrained_dir() / P.LPIPS_NPZ).exists(),
    reason="official LPIPS weights not dropped in (docs/PRETRAINED.md)")
def test_real_lpips_in_reference_range(tmp_path):
    """With the REAL official weights present, LPIPS of a noisy pair must
    land inside the reference's plausibility range [0, 0.5]
    (eval_suite.py:15) — the proxy does not."""
    import imageio.v2 as imageio
    from diner_tpu.evaluation.suite import evaluate_folder
    rng = np.random.RandomState(0)
    vis = tmp_path / "vis"
    vis.mkdir()
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    noisy = np.clip(img + rng.randn(64, 64, 3) * 40, 0, 255).astype(np.uint8)
    imageio.imwrite(vis / "0-gt.png", img)
    imageio.imwrite(vis / "0-pred.png", noisy)
    avg = evaluate_folder(vis, tmp_path / "scores")
    assert 0.0 < avg["lpips"] < 0.5
