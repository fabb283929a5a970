"""NOVEL renderer — depth-guided sampling with mesh-offset deformation.

Parity target: reference ``src/models/novel/nerf_novel_renderer.py`` — the
DINER renderer plus ``deform_points``: each target-space sample point is
moved by the offset of its nearest target-mesh vertex (top-1 kNN) before
projection into the observation-space source views (:40-50, :107); the
field is evaluated at the observation-deformed points with latent-plane
lookups at the gen-deformed points (:394-445).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from diner_tpu.models.novel.model import GenContext, NovelPixelNeRF
from diner_tpu.models.scene import SceneContext
from diner_tpu.ops.composite import composite
from diner_tpu.ops.knn import deform_points
from diner_tpu.ops.sampling import fill_up_uniform, sample_depthguided
from diner_tpu.renderer.renderer import RendererConfig, RenderOutput


def render_rays_novel(
    field_fn,
    ctx: SceneContext,
    gen: GenContext,
    rays,
    target_vertices,
    offsets_to_source,
    offsets_to_gen,
    key,
    cfg: RendererConfig,
    want_weights: bool = False,
) -> RenderOutput:
    """Render rays in target-expression space.

    field_fn: ``(ctx, gen, xyz_obs, xyz_gen, viewdirs) -> (SB, B, 4)``.
    target_vertices: (SB, V, 3) target-expression mesh vertices;
    offsets_to_source / offsets_to_gen: (SB, V, 3) per-vertex offsets from
    target space into observation / canonical space.
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

    def deform_to_source(xyz):
        return deform_points(xyz, target_vertices, offsets_to_source)

    z = sample_depthguided(
        rays, ctx.view_maps(), cfg.n_samples, cfg.n_depth_candidates,
        u_coarse, gauss, cfg.n_gaussian, cfg.depth_diff_max,
        deform_fn=deform_to_source)
    z = fill_up_uniform(z, rays, u_fill)

    K = cfg.n_samples
    points = rays[..., None, :3] + z[..., None] * rays[..., None, 3:6]
    points = points.reshape(SB, NR * K, 3)
    viewdirs = jnp.broadcast_to(
        rays[..., None, 3:6], (SB, NR, K, 3)).reshape(SB, NR * K, 3)

    pts_obs = deform_points(points, target_vertices, offsets_to_source)
    pts_gen = deform_points(points, target_vertices, offsets_to_gen)

    out = field_fn(ctx, gen, pts_obs, pts_gen, viewdirs)
    out = out.reshape(SB, NR, K, 4)
    comp = composite(out[..., :3], out[..., 3], z, rays,
                     white_bkgd=cfg.white_bkgd)
    return RenderOutput(rgb=comp.rgb, depth=comp.depth,
                        weights=comp.weights if want_weights else None)
