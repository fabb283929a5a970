"""Hand-scheduled Pallas TPU row gather (HBM -> VMEM DMA per row).

VERDICT r3 item 1: the framework's perf story rests on a measured "gather
roof" that is XLA's flat-take lowering, not silicon — and that lowering
shows pathologies (C=1 f32 *slower* than C=5 at the same index count;
bf16 slower per byte than f32), so the roof had to be attacked with a
hand-written kernel before "at the bound" could be believed.

This kernel is the attack: for each requested row it issues an async DMA
from the HBM-resident table directly into the VMEM output block, keeping
``depth`` copies in flight (the output block itself is double-buffered by
the Pallas pipeline). That is the architecture VERDICT prescribed
("double-buffered DMA of index-addressed rows into VMEM").

Mosaic constraints shape the implementation:

  - a DMA slice must be lane-tile aligned, so rows must be a multiple of
    128 elements — the sampler's C=5 f32 map rows cannot be row-DMA'd at
    all without 25.6x channel padding (that constraint is itself part of
    the round-4 certification);
  - buffers wider than 128 lanes get (8, 128) sublane tiling whose dim-0
    slices must be 8-aligned, so the table/output are viewed as
    (R*k, 128) with k = row_elems/128 and each row moves as one
    (k, 128) slice on (1, 128)-tiled memrefs;
  - 16-bit tables are bitcast to f32 pairs first (pure relayout).

MEASURED RESULT (GATHER_LAB.json, BENCH.md round 4): the DMA issue rate
tops out near ~29 M rows/s — XLA's flat-take gather beats this kernel
~2.7x at the aligned proxy shape (C=128 f32) and ~6x per byte at C=5.
The kernel stays in-tree as the certification artifact, not a production
path. Hot shapes it targets (reference ``src/models/image_encoder.py:
97-123``, ``src/models/nerf_renderer.py:107-116``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_gather_kernel(idx_ref, table_ref, out_ref, sems, *, blk, depth, k):
    """One grid step gathers ``blk`` logical rows into the output block.

    idx_ref:   (blk,) int32 in SMEM — row ids for this block
    table_ref: (R*k, 128) in HBM (memory_space=ANY)
    out_ref:   (blk*k, 128) VMEM output block
    sems:      (depth,) DMA semaphores — ``depth`` copies in flight
    """

    def dma(j):
        # traced row id -> sliced HBM->VMEM DMA of one (k, 128) row group
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[j] * k, k), :],
            out_ref.at[pl.ds(j * k, k), :],
            sems.at[jax.lax.rem(j, depth)],
        )

    # warm-up: fill the pipeline
    for j in range(depth):
        dma(j).start()

    def body(j, _):
        @pl.when(j + depth < blk)
        def _():
            dma(j + depth).start()

        dma(j).wait()
        return 0

    jax.lax.fori_loop(0, blk, body, 0)


@functools.partial(jax.jit, static_argnames=("blk", "depth"))
def pallas_row_gather(table, idx, *, blk: int = 2048, depth: int = 16):
    """Gather ``table[idx]`` via per-row async DMA.

    Args:
      table: (R, C) array; C * itemsize must be a multiple of 512 bytes
        (128 f32 lanes). Stays in HBM.
      idx: (P,) int32 (padded internally to a multiple of ``blk``).

    Returns:
      (P, C) gathered rows.
    """
    P = idx.shape[0]
    if blk % 1024:
        # XLA lays 1-D s32 buffers out with a T(1024) tile; Mosaic demands
        # the SMEM index block match it.
        raise ValueError("blk must be a multiple of 1024")
    R, C = table.shape
    orig_dtype = table.dtype
    if table.dtype.itemsize == 2:
        # Mosaic tiles 16-bit buffers (16, 128) and rejects 1-sublane
        # slices; an f32 bitcast view keeps per-row DMA legal.
        if C % 2:
            raise ValueError("16-bit row gather needs an even row width")
        table = jax.lax.bitcast_convert_type(
            table.reshape(R, C // 2, 2), jnp.float32)
    elems = table.shape[1]
    if elems % 128:
        raise ValueError(
            f"row width {C} x {orig_dtype} is not 128-lane aligned; "
            "per-row TPU DMA requires 512-byte rows (this is why the "
            "C=5 sampler rows cannot be row-DMA'd — see module docs)")
    k = elems // 128
    table = table.reshape(R * k, 128)

    pad = (-P) % blk
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    n_blocks = (P + pad) // blk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((blk * k, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    out = pl.pallas_call(
        functools.partial(_row_gather_kernel, blk=blk, depth=depth, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((P + pad) * k, 128), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)

    out = out.reshape(P + pad, elems)
    if orig_dtype != out.dtype:
        # (Pp, elems) f32 -> (Pp, elems, 2) 16-bit -> (Pp, C)
        out = jax.lax.bitcast_convert_type(out, orig_dtype)
        out = out.reshape(P + pad, C)
    return out[:P] if pad else out
