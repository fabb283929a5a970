"""Aux subsystem tests: NOVEL train step, profiling harness, torch-convert
VGG path, bicubic resize parity."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from diner_tpu.utils.profiling import cost_analysis, sync, time_fn
from diner_tpu.utils.resize import resize_bicubic_align_corners


def test_bicubic_resize_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    ours = np.asarray(resize_bicubic_align_corners(jnp.asarray(x), 14, 18))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (14, 18),
        mode="bicubic", align_corners=True).numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               atol=1e-4, rtol=1e-4)


def test_profiling_harness():
    @jax.jit
    def f(x):
        return jnp.tanh(x @ x)

    x = jnp.asarray(np.random.RandomState(1).randn(64, 64), jnp.float32)
    res = time_fn(f, x, warmup=1, iters=2,
                  vary=lambda args, i: (args[0] + i * 1e-6,))
    assert res["min_s"] > 0
    ca = cost_analysis(lambda y: y @ y, x)
    assert ca["flops"] >= 2 * 64 ** 3 * 0.5  # at least the matmul


@pytest.mark.slow
def test_novel_train_step_runs():
    from diner_tpu.models.novel.model import NovelPixelNeRFConfig
    from diner_tpu.models.novel.train import (
        NovelConfig,
        create_novel_state,
        make_novel_train_step,
    )
    from diner_tpu.nn.spatial_encoder import SpatialEncoderConfig
    from diner_tpu.renderer import RendererConfig
    from diner_tpu.data.synthetic import make_sphere_scene

    rng = np.random.RandomState(0)
    batch = dict(make_sphere_scene(H=24, W=24, nv=2))
    batch["gen_extrinsics"] = batch["target_extrinsics"]
    batch["gen_intrinsics"] = batch["target_intrinsics"]
    nv = 40
    batch["target_vertices"] = jnp.asarray(
        rng.randn(1, nv, 3).astype(np.float32) * 0.3)
    batch["offset_target_to_source"] = jnp.asarray(
        rng.randn(1, nv, 3).astype(np.float32) * 0.02)
    batch["offset_target_to_gen"] = jnp.asarray(
        rng.randn(1, nv, 3).astype(np.float32) * 0.02)

    cfg = NovelConfig(
        nerf=NovelPixelNeRFConfig(
            encoder=SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                                         image_padding=8, padding_pe=4),
            d_hidden=32, gen_latent_hw=48,
            gen_latent_ch=64 + 64 + 128 + 256),
        renderer=RendererConfig(n_samples=8, n_depth_candidates=32,
                                n_gaussian=2, white_bkgd=True),
        ray_batch_size=16, lr=1e-3)
    model, state = create_novel_state(cfg, jax.random.PRNGKey(3), batch)
    step_fn = jax.jit(make_novel_train_step(model, cfg))
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    assert np.isfinite(float(metrics["total"]))
    assert int(state.step) == 2


def test_dict_average_meter():
    from diner_tpu.utils.meters import DictAverageMeter

    m = DictAverageMeter()
    m.update({"loss": 2.0, "psnr": 10.0})
    m.update({"loss": 4.0, "psnr": 20.0}, n=3)
    avg = m.mean()
    assert abs(avg["loss"] - (2 + 4 * 3) / 4) < 1e-9
    assert abs(avg["psnr"] - (10 + 20 * 3) / 4) < 1e-9
    m.reset()
    assert m.mean() == {} and m.count == 0


def test_reduce_scalar_dict_and_synchronize_single_process():
    from diner_tpu.utils.meters import reduce_scalar_dict, synchronize

    out = reduce_scalar_dict({"a": 1.5, "b": 2.0})
    assert out == {"a": 1.5, "b": 2.0}
    synchronize()  # no-op, must not raise


def test_assert_honest_sync_guard():
    """The timing guard passes on a working backend and actually measures
    nonzero wall time; with an absurd floor it must trip."""
    import pytest
    from diner_tpu.utils import profiling

    dt = profiling.assert_honest_sync(min_floor_s=0.0)
    assert dt > 0
    with pytest.raises(AssertionError):
        profiling.assert_honest_sync(min_floor_s=1e9)
