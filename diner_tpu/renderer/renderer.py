"""Functional depth-guided-sampling volume renderer.

Parity target: reference ``src/models/nerf_renderer.py`` (NeRFRendererDGS):
single-stage renderer — depth-guided shortlist → uniform fill-up → field
evaluation → alpha compositing. Stateless: the field is a closure
``field_fn(ctx, xyz, viewdirs) -> (SB, B, 4)`` and randomness is an explicit
key, so the whole render is jit/pjit-compatible and trivially shardable over
the ray axis (rays are independent; no cross-ray collectives).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from diner_tpu.models.scene import SceneContext
from diner_tpu.ops.composite import composite
from diner_tpu.ops.sampling import (
    fill_up_uniform,
    sample_depthguided,
    sample_depthguided_pruned,
)


@dataclass(frozen=True)
class RendererConfig:
    n_samples: int = 40
    n_depth_candidates: int = 1000
    n_gaussian: int = 15
    white_bkgd: bool = True
    depth_diff_max: float = 0.05
    # opt-in two-stage sampler (ops/sampling.sample_depthguided_pruned):
    # score n_coarse_candidates coarse bins first, refine the fine grid
    # inside the top n_refine_bins bins. 0 = reference one-stage behavior.
    # Cuts sampler map gathers ~4x (1000 -> 125 + 16*8 = 253 indices/ray);
    # certified by PSNR-parity A/B, not bit-parity (see BENCH.md round 5).
    n_coarse_candidates: int = 0
    n_refine_bins: int = 16
    # rays per chunk for full-image rendering; bounds peak memory like the
    # reference's eval_batch_size=100000 point chunks (nerf_renderer.py:28)
    ray_chunk: int = 4096
    # "xla" (default) or "pallas" (fused single-pass kernel with custom VJP;
    # numerically identical — see ops/pallas/composite_pallas.py)
    composite_impl: str = "xla"


class RenderOutput(NamedTuple):
    rgb: jax.Array              # (SB, NR, 3)
    depth: jax.Array            # (SB, NR)
    weights: Optional[jax.Array]  # (SB, NR, K) or None


FieldFn = Callable[[SceneContext, jax.Array, jax.Array], jax.Array]


def render_rays(
    field_fn: FieldFn,
    ctx: SceneContext,
    rays,
    key,
    cfg: RendererConfig,
    want_weights: bool = False,
) -> RenderOutput:
    """Render a batch of rays.

    Args:
      field_fn: ``(ctx, xyz (SB,B,3), viewdirs (SB,B,3)) -> (SB,B,4)``.
      ctx: encoded scene.
      rays: (SB, NR, 8).
      key: PRNG key (sampling jitter + Gaussian draws).
      cfg: RendererConfig.
    """
    SB, NR, _ = rays.shape
    k_coarse, k_gauss, k_fill = jax.random.split(key, 3)
    u_coarse = jax.random.uniform(
        k_coarse, (SB, NR, cfg.n_depth_candidates), dtype=rays.dtype)
    gauss = jax.random.normal(
        k_gauss, (SB, NR, cfg.n_gaussian), dtype=rays.dtype) \
        if cfg.n_gaussian > 0 else None
    u_fill = jax.random.uniform(
        k_fill, (SB, NR, cfg.n_samples), dtype=rays.dtype)

    if cfg.n_coarse_candidates > 0:
        z = sample_depthguided_pruned(
            rays, ctx.view_maps(), cfg.n_samples, cfg.n_depth_candidates,
            cfg.n_coarse_candidates, cfg.n_refine_bins,
            u_coarse, gauss, cfg.n_gaussian, cfg.depth_diff_max)
    else:
        z = sample_depthguided(
            rays, ctx.view_maps(), cfg.n_samples, cfg.n_depth_candidates,
            u_coarse, gauss, cfg.n_gaussian, cfg.depth_diff_max)
    z = fill_up_uniform(z, rays, u_fill)  # (SB, NR, K) sorted

    K = cfg.n_samples
    points = rays[..., None, :3] + z[..., None] * rays[..., None, 3:6]
    viewdirs = jnp.broadcast_to(rays[..., None, 3:6], points.shape)
    out = field_fn(ctx, points.reshape(SB, NR * K, 3),
                   viewdirs.reshape(SB, NR * K, 3))
    out = out.reshape(SB, NR, K, 4)

    if cfg.composite_impl == "pallas":
        from diner_tpu.ops.pallas.composite_pallas import composite_pallas
        comp = composite_pallas(out[..., :3], out[..., 3], z, rays,
                                white_bkgd=cfg.white_bkgd)
    else:
        comp = composite(out[..., :3], out[..., 3], z, rays,
                         white_bkgd=cfg.white_bkgd)
    return RenderOutput(
        rgb=comp.rgb, depth=comp.depth,
        weights=comp.weights if want_weights else None)


def render_rays_chunked(
    field_fn: FieldFn,
    ctx: SceneContext,
    rays,
    key,
    cfg: RendererConfig,
) -> RenderOutput:
    """Memory-bounded render of many rays (e.g. a full image).

    Pads the ray axis to a multiple of ``cfg.ray_chunk`` and scans over
    chunks with ``lax.map`` — the TPU-native version of the reference's
    Python split-loops (``diner.py:85``, ``nerf_renderer.py:328-333``).
    """
    SB, NR, _ = rays.shape
    chunk = min(cfg.ray_chunk, NR)
    n_chunks = -(-NR // chunk)
    # NOTE: the wide-row pair-table latent lookup (ctx.with_latent_pairs())
    # wins in isolation (13.8 vs 17.5 ms per 163,840 points,
    # GATHER_LAB2.json) but LOSES ~5% inside this full render graph
    # (EVAL_RENDER_r04.json: 19.3 vs 18.4 s/image at the 512x640 eval
    # workload) — the per-corner gathers fuse into the lerp chain while the
    # paired fetch's (P, 2, C) slicing does not. Deliberately NOT attached
    # here; the op stays available and tested for callers that want it.
    pad = n_chunks * chunk - NR
    rays_p = jnp.pad(rays, ((0, 0), (0, pad), (0, 0)), mode="edge")
    rays_c = rays_p.reshape(SB, n_chunks, chunk, 8).transpose(1, 0, 2, 3)
    keys = jax.random.split(key, n_chunks)

    def body(args):
        r, k = args
        o = render_rays(field_fn, ctx, r, k, cfg, want_weights=False)
        return o.rgb, o.depth

    rgb, depth = jax.lax.map(body, (rays_c, keys))
    rgb = rgb.transpose(1, 0, 2, 3).reshape(SB, n_chunks * chunk, 3)[:, :NR]
    depth = depth.transpose(1, 0, 2).reshape(SB, n_chunks * chunk)[:, :NR]
    return RenderOutput(rgb=rgb, depth=depth, weights=None)
