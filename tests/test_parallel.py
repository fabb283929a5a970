"""Multi-device tests on the virtual 8-device CPU mesh: sharded train step
runs, matches the single-device step numerically, and ray-axis sharding is
actually applied.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diner_tpu.data.synthetic import make_sphere_scene
from diner_tpu.models.pixelnerf import PixelNeRFConfig
from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
from diner_tpu.renderer import RendererConfig
from diner_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    shard_batch,
)
from diner_tpu.train.diner import DinerConfig, create_state, make_train_step


def _tiny_cfg():
    return DinerConfig(
        nerf=PixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                                         image_padding=8, padding_pe=4),
            d_hidden=64,
        ),
        renderer=RendererConfig(n_samples=8, n_depth_candidates=32,
                                n_gaussian=2, white_bkgd=True),
        ray_batch_size=64,
        lr=5e-4,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_step_matches_single_device():
    batch = make_sphere_scene(H=24, W=24, nv=2, sb=2)
    cfg = _tiny_cfg()
    model, state = create_state(cfg, jax.random.PRNGKey(3), batch)
    key = jax.random.PRNGKey(7)

    # single-device baseline
    base_step = jax.jit(make_train_step(model, cfg))
    state_ref, metrics_ref = base_step(state, batch, key)

    # 8-device (2 data x 4 rays) mesh
    mesh = make_mesh(8, data_parallel=2)
    pstep = make_parallel_train_step(model, cfg, mesh, donate_state=False)
    state_sh, metrics_sh = pstep(state, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(metrics_ref["total"]),
                               float(metrics_sh["total"]),
                               rtol=2e-4, atol=1e-5)
    ref_leaf = np.asarray(state_ref.params["mlp"]["lin_out"]["kernel"])
    sh_leaf = np.asarray(state_sh.params["mlp"]["lin_out"]["kernel"])
    np.testing.assert_allclose(ref_leaf, sh_leaf, rtol=1e-3, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["rays"] == 8
    mesh = make_mesh(8, data_parallel=1)
    assert mesh.shape["rays"] == 8


def test_multihost_meter_reduction_and_barrier():
    """Execute the multihost reduction core of utils/meters.py
    (process_allgather + mean/sum) and the barrier on the virtual mesh;
    with one real process the gather is a (1, K) identity, so values must
    round-trip exactly."""
    from diner_tpu.utils import meters

    # single-process fast path
    out = meters.reduce_scalar_dict({"a": 1.5, "b": 2.0})
    assert out == {"a": 1.5, "b": 2.0}

    # multihost core (real process_allgather call)
    out = meters._allgather_reduce({"a": 1.5, "b": 2.0})
    assert abs(out["a"] - 1.5) < 1e-6 and abs(out["b"] - 2.0) < 1e-6
    out = meters._allgather_reduce({"a": 3.0}, average=False)
    assert abs(out["a"] - 3.0) < 1e-6
    meters.synchronize("test-barrier")  # must not raise


@pytest.mark.slow
def test_dryrun_multichip_entry():
    """The driver's dryrun_multichip contract: N train steps + eval step
    over an 8-device virtual mesh."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
