"""Multi-chip training: the DINER step jitted over a ('data', 'rays') mesh.

Usage::

    mesh = make_mesh()
    model, state = create_state(cfg, rng, example_batch)
    step = make_parallel_train_step(model, cfg, mesh)
    state, metrics = step(state, shard_batch(batch, mesh), key)

Parameters/optimizer state are replicated (they are tiny: a ResNet34 +
512-wide MLP), scenes are sharded over ``data`` and rays over ``rays``;
XLA inserts the gradient all-reduce (psum over both axes) and overlaps it
with the backward pass. Multi-host extension: call
``jax.distributed.initialize()`` before building the mesh — the same code
paths then run over all hosts' devices with ICI/DCN routing handled by XLA.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from diner_tpu.parallel.sharding import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from diner_tpu.train.diner import (
    DinerConfig,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "make_parallel_train_step",
    "make_parallel_eval_step",
]


def _batch_shardings(batch, mesh: Mesh):
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    return {
        k: bsh if (hasattr(v, "ndim") and v.ndim >= 1 and
                   v.shape[0] % mesh.shape[DATA_AXIS] == 0) else rep
        for k, v in batch.items()
    }


def _jit_over_mesh(fn, mesh: Mesh, donate_state: bool):
    """jit `fn(state, batch, key)` with replicated state + data-sharded batch,
    re-specializing per batch signature (shapes are static under jit)."""
    rep = replicated(mesh)
    cache = {}

    def step(state, batch, key):
        sig = tuple(sorted((k, v.shape, str(v.dtype))
                           for k, v in batch.items()))
        compiled = cache.get(sig)
        if compiled is None:
            compiled = jax.jit(
                fn,
                in_shardings=(
                    jax.tree_util.tree_map(lambda _: rep, state),
                    _batch_shardings(batch, mesh),
                    rep,
                ),
                donate_argnums=(0,) if donate_state else (),
            )
            cache[sig] = compiled
        with jax.set_mesh(mesh):
            return compiled(state, batch, key)

    return step


def make_parallel_train_step(model, cfg: DinerConfig, mesh: Mesh,
                             donate_state: bool = True):
    return _jit_over_mesh(make_train_step(model, cfg), mesh, donate_state)


def make_parallel_eval_step(model, cfg: DinerConfig, mesh: Mesh):
    return _jit_over_mesh(make_eval_step(model, cfg), mesh,
                          donate_state=False)
