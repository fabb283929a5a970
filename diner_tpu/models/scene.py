"""SceneContext — the explicit, shardable state the reference hides in
module buffers.

The reference's ``PixelNeRF.encode`` caches features/poses as non-persistent
nn.Module buffers (``src/models/pixelnerf.py:27-30, 47-51``;
``image_encoder.py:92, 214-216``). Here the encoded scene is an explicit
pytree passed to every render call: that is what makes ``pjit`` sharding,
donation and multi-chip replication clean.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from typing import Optional

from diner_tpu.ops.grid_sample import (
    build_pair_table,
    grid_sample_bilinear_imggrad,
    grid_sample_bilinear_pairs,
)
from diner_tpu.ops.sampling import ViewMaps


@flax.struct.dataclass
class SceneContext:
    """Everything the conditioned field needs about the source views.

    Shapes:
      latent:      (SB, NV, H_lat, W_lat, C)  pixel-aligned CNN features
      depths:      (SB, NV, H, W, 1)
      depth_stds:  (SB, NV, H, W, 1)
      normals:     (SB, NV, H, W, 3)
      poses:       (SB, NV, 4, 4)   world→cam extrinsics
      focal:       (SB, NV, 2)
      c:           (SB, NV, 2)
      image_wh:    (2,) [W, H] floats
      feature_padding: static int — latent-canvas padding in latent px
    """

    latent: jax.Array
    depths: jax.Array
    depth_stds: jax.Array
    normals: jax.Array
    poses: jax.Array
    focal: jax.Array
    c: jax.Array
    image_wh: jax.Array
    feature_padding: int = flax.struct.field(pytree_node=False, default=0)
    # optional wide-row pair table (ops.grid_sample.build_pair_table) for
    # the render-many-chunks-per-encode path; see with_latent_pairs()
    latent_pairs: Optional[jax.Array] = None

    @property
    def num_views(self) -> int:
        return self.poses.shape[1]

    def with_latent_pairs(self) -> "SceneContext":
        """Attach the wide-row x-pair latent table (2x latent bytes).

        Measured (GATHER_LAB2.json): the paired lookup runs the field
        gather at ~13.8 ms vs 17.5 per 163,840 points, but building the
        table costs ~12.4 ms — so this pays only where ONE encode feeds
        MANY render chunks (full-image eval: ~80 chunks per 512x640
        image). The training step (one render per encode) keeps the
        plain 4-corner custom-VJP path.
        """
        if self.latent_pairs is not None or self.latent.shape[3] % 2:
            return self
        lat = self.latent.reshape((-1,) + self.latent.shape[2:])
        return self.replace(latent_pairs=build_pair_table(lat))

    def view_maps(self) -> ViewMaps:
        return ViewMaps(
            depths=self.depths,
            depth_stds=self.depth_stds,
            normals=self.normals,
            poses=self.poses,
            focal=self.focal,
            c=self.c,
            image_wh=self.image_wh,
        )


def index_latent(ctx: SceneContext, uv_ndc):
    """Pixel-aligned latent lookup with the feature-padding uv rescale.

    The latent canvas covers the *padded* image, so normalized coords on the
    unpadded image are shrunk by (latent_size − 2·pad) / latent_size before
    bilinear/border sampling (reference ``image_encoder.py:112-123``).

    Args:
      uv_ndc: (SB, NV, P, 2) in [-1, 1] on the unpadded image.

    Returns:
      (SB, NV, P, C).
    """
    SB, NV, P, _ = uv_ndc.shape
    Hl, Wl = ctx.latent.shape[2], ctx.latent.shape[3]
    scale = jnp.asarray(
        [
            (Wl - 2.0 * ctx.feature_padding) / Wl,
            (Hl - 2.0 * ctx.feature_padding) / Hl,
        ],
        dtype=uv_ndc.dtype,
    )
    uv = (uv_ndc * scale).reshape(SB * NV, P, 2)
    if ctx.latent_pairs is not None:
        # wide-row pair-table fast path (bit-identical forward; eval only)
        out = grid_sample_bilinear_pairs(
            ctx.latent_pairs,
            (SB * NV,) + ctx.latent.shape[2:], uv, "border")
        return out.reshape(SB, NV, P, -1)
    latent = ctx.latent.reshape((SB * NV,) + ctx.latent.shape[2:])
    # custom-VJP sampler: image grads only (uv comes from stop_gradient-ed
    # sample positions + camera constants on this path), f32 scatter accum
    out = grid_sample_bilinear_imggrad(latent, uv, "border")
    return out.reshape(SB, NV, P, -1)
