"""End-to-end test: reference-format torch .ckpt -> orbax via the CLI."""

import pytest

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_convert_checkpoint_cli(tmp_path):
    torch = __import__("torch")
    sys.path.insert(0, str(REPO / "tests"))
    from test_full_parity import TorchDiner

    tref = TorchDiner()
    sd = {"nerf." + k: v for k, v in tref.state_dict().items()}
    ckpt = tmp_path / "DINER.ckpt"
    torch.save({"state_dict": sd, "epoch": 1}, ckpt)

    out = tmp_path / "converted"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "convert_checkpoint.py"),
         "--ckpt", str(ckpt), "--config",
         str(REPO / "configs" / "train_synthetic.yaml"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=900,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr
    assert "parameter tensors" in r.stdout

    # restore and compare one leaf against the torch source
    import jax
    jax.config.update("jax_platforms", "cpu")
    from diner_tpu.data.synthetic import make_sphere_scene
    from diner_tpu.train import checkpoint as ckpt_lib
    from diner_tpu.train.config import load_train_config
    from diner_tpu.train.diner import create_state

    run_cfg = load_train_config(
        str(REPO / "configs" / "train_synthetic.yaml"), model_name="DINER")
    batch = make_sphere_scene(H=64, W=64, nv=2)
    _, state = create_state(run_cfg.diner, jax.random.PRNGKey(0), batch,
                            max_init_tries=1)
    latest = ckpt_lib.latest_checkpoint(out) or out
    state = ckpt_lib.restore_checkpoint(latest, state)

    w_torch = tref.state_dict()["mlp_fine.lin_out.weight"].numpy()
    w_jax = np.asarray(state.params["mlp"]["lin_out"]["kernel"])
    np.testing.assert_allclose(w_jax, w_torch.T, atol=1e-6)


@pytest.mark.slow
def test_convert_transmvsnet_checkpoint_cli(tmp_path):
    """Reference TransMVSNet torch checkpoint -> orbax via the CLI, using
    the ACTUAL reference model's state dict (trainer blob protocol,
    deps/TransMVSNet/train.py:100-104)."""
    import subprocess
    import sys as _sys

    import torch
    from tests import ref_shims
    ref_shims.install()
    if "/root/reference/deps/TransMVSNet" not in _sys.path:
        _sys.path.insert(0, "/root/reference/deps/TransMVSNet")
    from models.TransMVSNet import TransMVSNet as RefTransMVSNet

    torch.manual_seed(0)
    ref = RefTransMVSNet(ndepths=[8, 8, 8], depth_interals_ratio=[4, 2, 1])
    ckpt = tmp_path / "model_000001.ckpt"
    torch.save({"epoch": 1, "model": ref.state_dict()}, ckpt)

    out = tmp_path / "converted"
    r = subprocess.run(
        [_sys.executable, "scripts/convert_checkpoint.py", "--ckpt",
         str(ckpt), "--arch", "transmvsnet", "--ndepths", "8,8,8",
         "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TransMVSNet tensors" in r.stdout

    from diner_tpu.train import checkpoint as ckpt_lib
    restored = ckpt_lib.restore_checkpoint(
        ckpt_lib.latest_checkpoint(out), None)
    w_ref = ref.state_dict()["feature.conv0.0.conv.weight"].numpy()
    w_j = np.asarray(
        restored["params"]["feature"]["conv0_0"]["conv"]["kernel"])
    np.testing.assert_allclose(w_j, np.transpose(w_ref, (2, 3, 1, 0)),
                               atol=1e-7)
