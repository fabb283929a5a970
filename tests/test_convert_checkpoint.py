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
