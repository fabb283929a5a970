"""Parity tests for diner_tpu.ops.grid_sample against torch.nn.functional.

The reference's entire sampling stack sits on grid_sample; these tests pin the
semantics (align_corners=False, border/zeros padding, nearest rounding, and
the custom exponential padding of ``src/util/torch_helpers.py:100-160``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from diner_tpu.ops.grid_sample import (
    grid_sample_bilinear,
    grid_sample_bilinear_imggrad,
    grid_sample_nearest,
    grid_sample_exponential_nearest,
)


def _rand_img_uv(seed, N=2, H=13, W=17, C=5, P=200, uv_range=1.4):
    rng = np.random.RandomState(seed)
    img = rng.randn(N, H, W, C).astype(np.float32)
    uv = (rng.rand(N, P, 2).astype(np.float32) * 2 - 1) * uv_range
    return img, uv


def _torch_grid_sample(img_nhwc, uv, mode, padding_mode):
    img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))  # NCHW
    grid = torch.from_numpy(uv)[:, :, None, :]  # (N, P, 1, 2)
    out = F.grid_sample(img, grid, mode=mode, padding_mode=padding_mode,
                        align_corners=False)
    return out[:, :, :, 0].permute(0, 2, 1).numpy()  # (N, P, C)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_bilinear_matches_torch(padding):
    img, uv = _rand_img_uv(0)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(uv), padding))
    ref = _torch_grid_sample(img, uv, "bilinear", padding)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_nearest_matches_torch(padding):
    img, uv = _rand_img_uv(1)
    ours = np.asarray(grid_sample_nearest(jnp.asarray(img), jnp.asarray(uv), padding))
    ref = _torch_grid_sample(img, uv, "nearest", padding)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_bilinear_inbounds_exact_values():
    """Sample exactly at a pixel center and check the value round-trips."""
    img = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
    H, W = 4, 6
    # pixel (row 2, col 3) center → normalized coords
    x = (3 + 0.5) / W * 2 - 1
    y = (2 + 0.5) / H * 2 - 1
    uv = np.tile(np.array([[x, y]], np.float32), (2, 1)).reshape(2, 1, 2)
    out = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(uv)))
    np.testing.assert_allclose(out[0, 0], img[0, 2, 3], atol=1e-5)
    np.testing.assert_allclose(out[1, 0], img[1, 2, 3], atol=1e-5)


def _torch_exponential_reference(img_nhwc, uv, pad_size, double_width):
    """Re-implementation of torch_helpers.grid_sample(padding='exponential')
    using the materialized padded canvas, as the reference does."""
    img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))
    N, C, H, W = img.shape
    base = F.pad(img, [pad_size] * 4, mode="replicate")
    exponents = torch.zeros(N, C, H + 2 * pad_size, W + 2 * pad_size)
    for i in range(pad_size):
        idx = pad_size - (i + 1)
        exponents[:, :, idx, :] = i
        exponents[:, :, -(idx + 1), :] = i
        exponents[:, :, :, idx] = i
        exponents[:, :, :, -(idx + 1)] = i
    padded = base * torch.exp(exponents / double_width * np.log(2))

    img_size = torch.tensor([W, H], dtype=torch.float)
    scale = img_size / (img_size + 2 * pad_size)
    grid = torch.from_numpy(uv)[:, :, None, :] * scale.view(1, 1, 1, 2)
    out = F.grid_sample(padded, grid, mode="nearest", padding_mode="zeros",
                        align_corners=False)
    return out[:, :, :, 0].permute(0, 2, 1).numpy()


@pytest.mark.parametrize("pad_size,double_width", [(100, 12.0), (40, 20.0)])
def test_exponential_matches_materialized_reference(pad_size, double_width):
    # uv_range large enough to land points deep in the padded ring and beyond
    img, uv = _rand_img_uv(2, N=2, H=12, W=10, C=1, P=500, uv_range=3.0)
    img = np.abs(img)  # depth std is non-negative
    ours = np.asarray(
        grid_sample_exponential_nearest(
            jnp.asarray(img), jnp.asarray(uv), pad_size, double_width
        )
    )
    ref = _torch_exponential_reference(img, uv, pad_size, double_width)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_bilinear_gradients_match_torch():
    img, uv = _rand_img_uv(3, N=1, H=8, W=9, C=2, P=50, uv_range=1.2)

    import jax

    def loss_jax(img_j):
        out = grid_sample_bilinear(img_j, jnp.asarray(uv), "border")
        return jnp.sum(out ** 2)

    g_jax = np.asarray(jax.grad(loss_jax)(jnp.asarray(img)))

    img_t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).requires_grad_(True)
    grid = torch.from_numpy(uv)[:, :, None, :]
    out = F.grid_sample(img_t, grid, mode="bilinear", padding_mode="border",
                        align_corners=False)
    (out ** 2).sum().backward()
    g_ref = np.transpose(img_t.grad.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(g_jax, g_ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_bilinear_imggrad_custom_vjp(padding):
    """The hand-written-VJP variant (hot latent path): forward identical to
    the autodiff sampler, image cotangent identical, uv cotangent zero."""
    img, uv = _rand_img_uv(7, N=2, H=8, W=9, C=4, P=60, uv_range=1.2)

    import jax

    fwd_ref = grid_sample_bilinear(jnp.asarray(img), jnp.asarray(uv), padding)
    fwd_new = grid_sample_bilinear_imggrad(jnp.asarray(img), jnp.asarray(uv),
                                           padding)
    np.testing.assert_array_equal(np.asarray(fwd_ref), np.asarray(fwd_new))

    def loss_ref(img_j):
        return jnp.sum(grid_sample_bilinear(img_j, jnp.asarray(uv),
                                            padding) ** 2)

    def loss_new(img_j, uv_j):
        return jnp.sum(grid_sample_bilinear_imggrad(img_j, uv_j,
                                                    padding) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(img)))
    g_img, g_uv = jax.grad(loss_new, argnums=(0, 1))(jnp.asarray(img),
                                                     jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(g_img), g_ref, atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(g_uv), 0.0)


def test_pair_table_bilinear_bit_identical():
    """grid_sample_bilinear_pairs == grid_sample_bilinear_imggrad forward
    bit-for-bit (same corners, same weight products and casts), in f32 and
    bf16, including border-clip edge coordinates."""
    import jax.numpy as jnp
    from diner_tpu.ops.grid_sample import (
        build_pair_table,
        grid_sample_bilinear_imggrad,
        grid_sample_bilinear_pairs,
    )

    rng = np.random.RandomState(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        N, H, W, C = 3, 6, 8, 5
        img = jnp.asarray(rng.randn(N, H, W, C), dtype)
        uv = jnp.asarray(rng.uniform(-1.4, 1.4, (N, 37, 2)), jnp.float32)
        # force exact-border and exact-integer coordinates into the set
        uv = uv.at[:, 0].set(jnp.asarray([1.0, 1.0]))
        uv = uv.at[:, 1].set(jnp.asarray([-1.0, -1.0]))
        uv = uv.at[:, 2].set(jnp.asarray([(2 * 6.0 + 1) / W - 1, 0.25]))
        ref = grid_sample_bilinear_imggrad(img, uv, "border")
        out = grid_sample_bilinear_pairs(
            build_pair_table(img), (N, H, W, C), uv, "border")
        np.testing.assert_array_equal(
            np.asarray(out).astype(np.float32),
            np.asarray(ref).astype(np.float32))


def test_pair_table_rejects_odd_width_and_zeros_mode():
    import jax.numpy as jnp
    import pytest
    from diner_tpu.ops.grid_sample import (
        build_pair_table, grid_sample_bilinear_pairs)
    with pytest.raises(ValueError):
        build_pair_table(jnp.zeros((1, 4, 5, 2)))
    t = build_pair_table(jnp.zeros((1, 4, 6, 2)))
    with pytest.raises(ValueError):
        grid_sample_bilinear_pairs(t, (1, 4, 6, 2),
                                   jnp.zeros((1, 3, 2)), "zeros")
