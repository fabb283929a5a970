"""Mesh depth rasterization on TPU (pyrender-equivalent GT depth).

The reference's preprocessing renders ground-truth depth maps with
pyrender/EGL (``deps/facescape_preprocessing/renderer.py:11-64``,
``deps/multiface/process_dataset.py``); this environment has no GL, so the
z-buffer is computed directly: every (pixel-tile × triangle-chunk) pair runs
a vectorized inside-triangle test + perspective-correct depth interpolation,
min-reduced over triangles. All dense math (no scatter), so it runs well
under jit on TPU; complexity O(H·W·F) — fine for the reference's ~50 k-face
head meshes at 256².
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("H", "W", "pixel_block",
                                             "face_chunk"))
def rasterize_depth(vertices, faces, K, Rt, H: int, W: int,
                    znear: float = 1e-4, pixel_block: int = 4096,
                    face_chunk: int = 4096):
    """Render a z-buffer depth map of a triangle mesh.

    Args:
      vertices: (V, 3) world-space vertices.
      faces: (F, 3) int vertex indices.
      K: (3, 3) intrinsics; Rt: (3, 4) or (4, 4) world→cam extrinsics.
      H, W: output resolution.

    Returns:
      (H, W) float32 z-depth; 0 where no triangle covers the pixel.
    """
    R = Rt[:3, :3]
    t = Rt[:3, 3]
    v_cam = vertices @ R.T + t  # (V, 3)
    z = v_cam[:, 2]
    uv = v_cam[:, :2] / jnp.where(z[:, None] == 0, 1e-9, z[:, None])
    uv = uv * jnp.stack([K[0, 0], K[1, 1]]) + jnp.stack([K[0, 2], K[1, 2]])

    tri_uv = uv[faces]          # (F, 3, 2)
    tri_z = z[faces]            # (F, 3)
    # backface/degenerate handling: keep all faces with positive z verts
    tri_valid = jnp.all(tri_z > znear, axis=-1)

    F = faces.shape[0]
    fpad = -(-F // face_chunk) * face_chunk - F
    tri_uv = jnp.pad(tri_uv, ((0, fpad), (0, 0), (0, 0)))
    tri_z = jnp.pad(tri_z, ((0, fpad), (0, 0)), constant_values=1.0)
    tri_valid = jnp.pad(tri_valid, (0, fpad))
    n_fchunks = tri_uv.shape[0] // face_chunk

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) + 0.5,
                          jnp.arange(W, dtype=jnp.float32) + 0.5,
                          indexing="ij")
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (P, 2)
    P = pix.shape[0]
    ppad = -(-P // pixel_block) * pixel_block - P
    pix = jnp.pad(pix, ((0, ppad), (0, 0)))
    pix_blocks = pix.reshape(-1, pixel_block, 2)

    def per_pixel_block(pblk):
        def face_step(best, idx):
            a = jax.lax.dynamic_slice_in_dim(tri_uv, idx * face_chunk,
                                             face_chunk)
            zt = jax.lax.dynamic_slice_in_dim(tri_z, idx * face_chunk,
                                              face_chunk)
            ok = jax.lax.dynamic_slice_in_dim(tri_valid, idx * face_chunk,
                                              face_chunk)
            v0, v1, v2 = a[:, 0], a[:, 1], a[:, 2]  # (Fc, 2)
            d = pblk[:, None] - v0[None]            # (Pb, Fc, 2)
            e1 = (v1 - v0)[None]
            e2 = (v2 - v0)[None]
            denom = e1[..., 0] * e2[..., 1] - e1[..., 1] * e2[..., 0]
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            b1 = (d[..., 0] * e2[..., 1] - d[..., 1] * e2[..., 0]) / denom
            b2 = (e1[..., 0] * d[..., 1] - e1[..., 1] * d[..., 0]) / denom
            b0 = 1.0 - b1 - b2
            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & ok[None]
            # perspective-correct: interpolate 1/z with screen barycentrics
            inv_z = (b0 / zt[None, :, 0] + b1 / zt[None, :, 1]
                     + b2 / zt[None, :, 2])
            depth = 1.0 / jnp.maximum(inv_z, 1e-9)
            depth = jnp.where(inside, depth, jnp.inf)
            return jnp.minimum(best, jnp.min(depth, axis=-1)), None

        init = jnp.full((pixel_block,), jnp.inf)
        best, _ = jax.lax.scan(face_step, init,
                               jnp.arange(n_fchunks))
        return best

    out = jax.lax.map(per_pixel_block, pix_blocks).ravel()[:P]
    out = jnp.where(jnp.isinf(out), 0.0, out)
    return out.reshape(H, W)


def load_obj_vertices_faces(path):
    """Minimal OBJ parser (v / f lines only) → (verts (V,3), faces (F,3))."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) - 1 for p in line.split()[1:]]
                for i in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))
