"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL DDP
(``deps/TransMVSNet/train.py:376-381``; Lightning ``strategy: ddp``): a 2-D
``('data', 'rays')`` mesh — scenes sharded over ``data``, the ray axis (the
renderer's sequence-length analogue) sharded over ``rays``. Per-ray work is
uniform (fixed sample count), so load balance is trivial and the only
collectives are the gradient psums XLA inserts, riding ICI and overlapped
with the backward pass by the latency-hiding scheduler.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None,
              data_parallel: Optional[int] = None) -> Mesh:
    """Build the ('data', 'rays') mesh over the available devices.

    ``data_parallel`` defaults to the largest power-of-two ≤ sqrt(n) so both
    axes get parallelism; pass 1 for pure ray sharding or n for pure DP.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if data_parallel is None:
        data_parallel = 1
        while (data_parallel * 2) ** 2 <= n and n % (data_parallel * 2) == 0:
            data_parallel *= 2
        if n % data_parallel != 0:
            data_parallel = 1
    assert n % data_parallel == 0, (n, data_parallel)
    return Mesh(devices.reshape(data_parallel, n // data_parallel),
                (DATA_AXIS, RAY_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scenes (leading batch axis) over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with scenes split over the data axis.

    Works unchanged across processes: under a multi-host runtime every
    process passes the same full host batch and contributes only its
    addressable shards (`parallel/distributed.py make_global_array`).
    """
    from diner_tpu.parallel.distributed import make_global_array

    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and \
                v.shape[0] % mesh.shape[DATA_AXIS] == 0:
            out[k] = make_global_array(v, sh)
        else:
            out[k] = make_global_array(v, rep)
    return out


def replicate_pytree(tree, mesh: Mesh):
    """Turn every leaf into a global fully-replicated array.

    Needed under a multi-process runtime, where per-process (host-local)
    arrays cannot feed a global jit: every process holds an identical copy
    (same seed → same params) and contributes its addressable replicas.
    """
    from diner_tpu.parallel.distributed import make_global_array

    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: make_global_array(np.asarray(x), rep), tree)


def constrain_rays(x, spec: Optional[Tuple[Optional[str], ...]]):
    """Apply a sharding constraint if a mesh context is active; no-op
    otherwise (keeps the renderer identical on a single device)."""
    if spec is None:
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if not getattr(mesh, "axis_names", ()):
        return x
    names = set(mesh.axis_names)
    spec = tuple(s if (s is None or s in names) else None for s in spec)
    spec = spec + (None,) * (x.ndim - len(spec))
    return jax.lax.with_sharding_constraint(x, P(*spec))
