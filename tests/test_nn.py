"""Parity tests for the flax NN stack vs torch re-statements + converters."""

import math

import numpy as np
import torch
import jax
import jax.numpy as jnp

from diner_tpu.nn.positional_encoding import PositionalEncoding
from diner_tpu.nn.resnetfc import ResnetFC
from diner_tpu.nn.resnet import ResNetEncoder
from diner_tpu.nn.spatial_encoder import (
    SpatialEncoder,
    SpatialEncoderConfig,
)
from diner_tpu.utils.resize import resize_bilinear_align_corners
from diner_tpu.utils.torch_convert import (
    convert_resnet,
    convert_resnetfc,
    convert_spatial_encoder,
)

from tests.torch_refs import (
    TorchPositionalEncoding,
    TorchResnetFC,
    TorchResNetPyramid,
    TorchSpatialEncoder,
    state_dict_numpy,
)


def test_positional_encoding_matches_reference():
    for num_freqs, d_in, ff, inc in [(6, 3, 6.28, True), (4, 2, math.pi, True),
                                     (6, 1, 6.28, False)]:
        x = np.random.RandomState(0).randn(7, 11, d_in).astype(np.float32)
        ours = np.asarray(PositionalEncoding(num_freqs, d_in, ff, inc)(jnp.asarray(x)))
        ref = TorchPositionalEncoding(num_freqs, d_in, ff, inc)(
            torch.from_numpy(x)).numpy()
        assert ours.shape == ref.shape
        # f32 arg reduction at the highest frequency costs a few ulp
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resnetfc_matches_reference():
    d_latent, d_in, d_hidden, B, NV = 32, 55, 64, 40, 3
    tref = TorchResnetFC(d_in, 4, 5, d_latent, d_hidden, combine_layer=3)
    x = np.random.RandomState(1).randn(2, NV, B, d_latent + d_in).astype(np.float32)
    ref = tref(torch.from_numpy(x), combine_dim=1).detach().numpy()

    model = ResnetFC(d_in=d_in, d_out=4, n_blocks=5, d_latent=d_latent,
                     d_hidden=d_hidden, combine_layer=3, combine_axis=1)
    variables = convert_resnetfc(state_dict_numpy(tref), 5, 3)
    ours = np.asarray(model.apply({"params": variables["params"]}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_resize_align_corners_matches_torch():
    x = np.random.RandomState(2).randn(2, 9, 13, 4).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 18, 26))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), (18, 26),
        mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               atol=1e-5)


def _randomize_bn_stats(module, rng):
    """Give running stats non-trivial values so eval-mode parity is real."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                np.abs(rng.randn(m.num_features)).astype(np.float32) + 0.5))


def test_resnet_pyramid_matches_torch_eval_and_train():
    blocks = (2, 2, 2, 2)  # resnet18-sized for test speed
    tref = TorchResNetPyramid(c_in=3, blocks=blocks, num_layers=4)
    with torch.no_grad():
        _randomize_bn_stats(tref, np.random.RandomState(3))
    x = np.random.RandomState(4).randn(2, 3, 32, 40).astype(np.float32)

    model = ResNetEncoder(backbone="resnet18", num_layers=4)
    variables = convert_resnet(state_dict_numpy(tref), 4, blocks)
    xs = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    # eval mode: running stats
    tref.eval()
    with torch.no_grad():
        ref = [t.numpy() for t in tref(torch.from_numpy(x))]
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        xs, train=False)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.transpose(np.asarray(o), (0, 3, 1, 2)),
                                   r, atol=1e-3, rtol=1e-3)

    # train mode: batch stats
    tref.train()
    with torch.no_grad():
        ref = [t.numpy() for t in tref(torch.from_numpy(x))]
    ours, _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        xs, train=True, mutable=["batch_stats"])
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.transpose(np.asarray(o), (0, 3, 1, 2)),
                                   r, atol=1e-3, rtol=1e-3)


def test_spatial_encoder_matches_reference():
    blocks = (2, 2, 2, 2)
    pad = 8
    tref = TorchSpatialEncoder(image_padding=pad, padding_pe=4,
                               num_layers=4, blocks=blocks)
    with torch.no_grad():
        _randomize_bn_stats(tref, np.random.RandomState(5))
    tref.eval()
    x = np.random.RandomState(6).rand(2, 3, 24, 28).astype(np.float32)
    with torch.no_grad():
        ref = tref(torch.from_numpy(x)).numpy()

    cfg = SpatialEncoderConfig(backbone="resnet18", num_layers=4,
                               image_padding=pad, padding_pe=4)
    model = SpatialEncoder(cfg=cfg)
    variables = convert_spatial_encoder(state_dict_numpy(tref), 4, blocks)
    ours = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_resnet_init_shapes():
    model = ResNetEncoder(backbone="resnet34", num_layers=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 21)),
                           train=False)
    latents = model.apply(variables, jnp.zeros((1, 64, 64, 21)), train=False)
    assert [t.shape[-1] for t in latents] == [64, 64, 128, 256]
    assert latents[0].shape[1:3] == (32, 32)
