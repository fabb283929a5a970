"""Fused alpha-compositing Pallas kernel (forward + custom VJP).

The XLA path (``diner_tpu.ops.composite``) materializes the full
(SB, B, K+1) alpha/transmittance tensors; this kernel streams the sample
axis instead: rays live on the 128-lane axis, and one static loop over the
K samples carries transmittance in registers — one HBM read per input
element, one write per output. The backward kernel reuses the recurrence
with a reverse suffix pass for dL/dα.

Numerics match ``ops.composite.composite`` exactly (same 1e-10 floor and
white-background residual); parity is enforced by tests (interpreter mode
on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diner_tpu.ops.composite import CompositeOutput

LANES = 128


def _fwd_kernel(z_ref, sigma_ref, rgb_ref, far_ref, rgb_out_ref,
                depth_out_ref, weights_out_ref, *, K: int,
                white_bkgd: bool):
    trans = jnp.ones((1, LANES), jnp.float32)
    rgb_acc = jnp.zeros((3, LANES), jnp.float32)
    depth_acc = jnp.zeros((1, LANES), jnp.float32)
    wsum = jnp.zeros((1, LANES), jnp.float32)
    for k in range(K):
        zk = z_ref[k, :][None]
        z_next = far_ref[0, :][None] if k == K - 1 else z_ref[k + 1, :][None]
        delta = z_next - zk
        sig = jnp.maximum(sigma_ref[k, :][None], 0.0)
        alpha = 1.0 - jnp.exp(-delta * sig)
        w = alpha * trans
        weights_out_ref[k, :] = w[0]
        rgb_acc = rgb_acc + w * rgb_ref[pl.ds(3 * k, 3), :]
        depth_acc = depth_acc + w * zk
        wsum = wsum + w
        trans = trans * (1.0 - alpha + 1e-10)
    if white_bkgd:
        rgb_acc = rgb_acc + (1.0 - wsum)
    rgb_out_ref[:, :] = rgb_acc
    depth_out_ref[:, :] = depth_acc


def _bwd_kernel(z_ref, sigma_ref, rgb_ref, far_ref, weights_ref,
                g_rgb_ref, g_depth_ref, g_w_ref,
                d_sigma_ref, d_rgb_ref, *, K: int, white_bkgd: bool):
    g_rgb = g_rgb_ref[:, :]          # (3, L)
    g_depth = g_depth_ref[0, :][None]
    g_rgb_sum = jnp.sum(g_rgb, axis=0, keepdims=True)

    # forward recompute of α_k and T_k (K is small and static; the per-step
    # state lives in registers — no (K+1)-sized intermediates in HBM)
    trans = jnp.ones((1, LANES), jnp.float32)
    alphas, Ts, deltas, gates = [], [], [], []
    for k in range(K):
        zk = z_ref[k, :][None]
        z_next = far_ref[0, :][None] if k == K - 1 else z_ref[k + 1, :][None]
        delta = z_next - zk
        sig_raw = sigma_ref[k, :][None]
        sig = jnp.maximum(sig_raw, 0.0)
        alpha = 1.0 - jnp.exp(-delta * sig)
        alphas.append(alpha)
        Ts.append(trans)
        deltas.append(delta)
        gates.append(jnp.where(sig_raw > 0.0, 1.0, 0.0))
        trans = trans * (1.0 - alpha + 1e-10)

    # reverse pass: dL/dα_k = T_k·dL/dw_k − (Σ_{j>k} dL/dw_j·w_j)/(1−α_k+ε)
    suffix = jnp.zeros((1, LANES), jnp.float32)
    for k in range(K - 1, -1, -1):
        zk = z_ref[k, :][None]
        alpha = alphas[k]
        w = alpha * Ts[k]
        dLdw = (jnp.sum(rgb_ref[pl.ds(3 * k, 3), :] * g_rgb, axis=0,
                        keepdims=True)
                + zk * g_depth + g_w_ref[k, :][None])
        if white_bkgd:
            dLdw = dLdw - g_rgb_sum
        dLdalpha = Ts[k] * dLdw - suffix / (1.0 - alpha + 1e-10)
        dalpha_dsig = deltas[k] * jnp.exp(
            -deltas[k] * jnp.maximum(sigma_ref[k, :][None], 0.0))
        d_sigma_ref[k, :] = (dLdalpha * dalpha_dsig * gates[k])[0]
        d_rgb_ref[pl.ds(3 * k, 3), :] = w * g_rgb
        suffix = suffix + dLdw * w


def _pad_to(x, n, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


def _composite_fwd_pallas(rgb, sigma, z_samp, far, white_bkgd, interpret):
    """rgb (R, K, 3), sigma (R, K), z (R, K), far (R,) → outputs."""
    R, K, _ = rgb.shape
    Rp = -(-R // LANES) * LANES
    zT = _pad_to(z_samp, Rp, 0).T            # (K, Rp)
    sigT = _pad_to(sigma, Rp, 0).T
    rgbT = _pad_to(rgb, Rp, 0).transpose(1, 2, 0).reshape(3 * K, Rp)
    farT = _pad_to(far[:, None], Rp, 0).T    # (1, Rp)

    grid = (Rp // LANES,)
    spec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    rgb_out, depth_out, weights_out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, white_bkgd=white_bkgd),
        grid=grid,
        in_specs=[spec(K), spec(K), spec(3 * K), spec(1)],
        out_specs=(spec(3), spec(1), spec(K)),
        out_shape=(
            jax.ShapeDtypeStruct((3, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((K, Rp), jnp.float32),
        ),
        interpret=interpret,
    )(zT, sigT, rgbT, farT)
    return (rgb_out[:, :R].T, depth_out[0, :R], weights_out[:, :R].T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _composite_core(rgb, sigma, z_samp, far, white_bkgd, interpret):
    out = _composite_fwd_pallas(rgb, sigma, z_samp, far, white_bkgd,
                                interpret)
    return out


def _core_fwd(rgb, sigma, z_samp, far, white_bkgd, interpret):
    out = _composite_fwd_pallas(rgb, sigma, z_samp, far, white_bkgd,
                                interpret)
    return out, (rgb, sigma, z_samp, far, out[2])


def _core_bwd(white_bkgd, interpret, res, g):
    rgb, sigma, z_samp, far, weights = res
    g_rgb, g_depth, g_w = g
    R, K, _ = rgb.shape
    Rp = -(-R // LANES) * LANES

    zT = _pad_to(z_samp, Rp, 0).T
    sigT = _pad_to(sigma, Rp, 0).T
    rgbT = _pad_to(rgb, Rp, 0).transpose(1, 2, 0).reshape(3 * K, Rp)
    farT = _pad_to(far[:, None], Rp, 0).T
    wT = _pad_to(weights, Rp, 0).T
    gR = _pad_to(g_rgb, Rp, 0).T            # (3, Rp)
    gD = _pad_to(g_depth[:, None], Rp, 0).T
    gW = _pad_to(g_w, Rp, 0).T

    grid = (Rp // LANES,)
    spec = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    d_sigma, d_rgb = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, white_bkgd=white_bkgd),
        grid=grid,
        in_specs=[spec(K), spec(K), spec(3 * K), spec(1), spec(K),
                  spec(3), spec(1), spec(K)],
        out_specs=(spec(K), spec(3 * K)),
        out_shape=(
            jax.ShapeDtypeStruct((K, Rp), jnp.float32),
            jax.ShapeDtypeStruct((3 * K, Rp), jnp.float32),
        ),
        interpret=interpret,
    )(zT, sigT, rgbT, farT, wT, gR, gD, gW)

    d_sigma = d_sigma[:, :R].T
    d_rgb = d_rgb[:, :R].reshape(K, 3, R).transpose(2, 0, 1)
    zeros_z = jnp.zeros_like(z_samp)
    zeros_far = jnp.zeros_like(far)
    return d_rgb, d_sigma, zeros_z, zeros_far


_composite_core.defvjp(_core_fwd, _core_bwd)


def composite_pallas(rgb, sigma, z_samp, rays, white_bkgd: bool = False,
                     interpret: bool = False) -> CompositeOutput:
    """Drop-in fused replacement for :func:`diner_tpu.ops.composite.composite`.

    Differentiable w.r.t. rgb and sigma (the z/ray path is produced by the
    stop-gradient sampler, as in the reference).
    """
    SB, B, K = sigma.shape
    rgb_f = rgb.reshape(SB * B, K, 3).astype(jnp.float32)
    sigma_f = sigma.reshape(SB * B, K).astype(jnp.float32)
    z_f = z_samp.reshape(SB * B, K).astype(jnp.float32)
    far_f = rays[..., 7].reshape(SB * B).astype(jnp.float32)
    rgb_o, depth_o, w_o = _composite_core(rgb_f, sigma_f, z_f, far_f,
                                          white_bkgd, interpret)
    return CompositeOutput(
        rgb=rgb_o.reshape(SB, B, 3),
        depth=depth_o.reshape(SB, B),
        weights=w_o.reshape(SB, B, K),
    )
