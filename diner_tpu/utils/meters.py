"""Metric aggregation + multi-host scalar reduction.

Parity targets: TransMVSNet's ``DictAverageMeter``
(``deps/TransMVSNet/utils.py:218-239``), ``reduce_scalar_outputs``
(:298-321, a NCCL ``dist.reduce`` of a scalar dict) and ``synchronize()``
(:277-289, a ``dist.barrier``). The TPU-native equivalents use
``jax.experimental.multihost_utils`` — collectives ride the same ICI/DCN
fabric the training step uses; no side channel needed.
"""

from __future__ import annotations

from typing import Dict, Mapping


class DictAverageMeter:
    """Running mean of a dict of scalars (utils.py:218-239)."""

    def __init__(self):
        self.sum_data: Dict[str, float] = {}
        self.count = 0

    def update(self, new: Mapping[str, float], n: int = 1):
        self.count += n
        for k, v in new.items():
            v = float(v)
            self.sum_data[k] = self.sum_data.get(k, 0.0) + v * n

    def mean(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1)
                for k, v in self.sum_data.items()}

    def reset(self):
        self.sum_data = {}
        self.count = 0


def reduce_scalar_dict(scalars: Mapping[str, float],
                       average: bool = True) -> Dict[str, float]:
    """Mean (or sum) of per-process scalar dicts across all JAX processes.

    Single-process: identity. Multi-host: ``process_allgather`` + mean —
    the jax-native ``reduce_scalar_outputs`` (every host gets the result,
    unlike the reference's rank-0-only ``dist.reduce``).
    """
    import jax

    if jax.process_count() == 1:
        return {k: float(v) for k, v in scalars.items()}
    return _allgather_reduce(scalars, average)


def _allgather_reduce(scalars: Mapping[str, float],
                      average: bool = True) -> Dict[str, float]:
    """The multihost reduction core (directly testable single-process:
    ``process_allgather`` then degenerates to a (1, K) identity gather)."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    keys = sorted(scalars.keys())
    vec = jnp.asarray([float(scalars[k]) for k in keys], jnp.float32)
    gathered = multihost_utils.process_allgather(vec)  # (nproc, K)
    red = gathered.mean(axis=0) if average else gathered.sum(axis=0)
    return {k: float(red[i]) for i, k in enumerate(keys)}


def synchronize(tag: str = "barrier"):
    """Cross-process barrier (utils.py:277-289). No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)
