"""Top-1 nearest-neighbor lookup against a vertex set (MXU-native).

TPU replacement for pytorch3d's CUDA ``knn_points`` (K=1) used by the NOVEL
renderer's mesh deformation (``src/models/novel/nerf_novel_renderer.py:47``):
distances are expanded as |p|² + |v|² − 2·p·v so the dominant term is one
(N, 3) × (3, V) matmul; points are chunked with ``lax.map`` to bound the
(chunk, V) distance tile in memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn1(points, vertices, chunk: int = 2048):
    """Index of the nearest vertex for every point.

    Args:
      points: (SB, N, 3).
      vertices: (SB, V, 3).
      chunk: points per distance tile (memory = chunk × V floats).

    Returns:
      (SB, N) int32 nearest-vertex indices.
    """
    SB, N, _ = points.shape
    V = vertices.shape[1]
    chunk = min(chunk, N)
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    pts = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
    pts = pts.reshape(SB, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

    v_sq = jnp.sum(vertices ** 2, axis=-1)  # (SB, V)

    def body(p):
        # p: (SB, chunk, 3)
        dot = jnp.einsum("sct,svt->scv", p, vertices)  # MXU
        d2 = v_sq[:, None] - 2.0 * dot  # |p|² constant per row — skip it
        return jnp.argmin(d2, axis=-1).astype(jnp.int32)

    idx = jax.lax.map(body, pts)  # (n_chunks, SB, chunk)
    return idx.transpose(1, 0, 2).reshape(SB, n_chunks * chunk)[:, :N]


def deform_points(points, target_vertices, offsets, chunk: int = 2048):
    """Move each point by the offset of its nearest target-mesh vertex
    (nerf_novel_renderer.py:40-50)."""
    idx = knn1(points, target_vertices, chunk)
    off = jnp.take_along_axis(offsets, idx[..., None], axis=1)
    return points + off
