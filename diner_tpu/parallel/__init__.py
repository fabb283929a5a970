from diner_tpu.parallel.distributed import (
    initialize,
    is_multiprocess,
    make_global_array,
)
from diner_tpu.parallel.sharding import (
    DATA_AXIS,
    RAY_AXIS,
    batch_sharding,
    constrain_rays,
    make_mesh,
    replicate_pytree,
    replicated,
    shard_batch,
)
from diner_tpu.parallel.train import (
    make_parallel_eval_step,
    make_parallel_train_step,
)

__all__ = [
    "DATA_AXIS",
    "RAY_AXIS",
    "batch_sharding",
    "constrain_rays",
    "initialize",
    "is_multiprocess",
    "make_global_array",
    "make_mesh",
    "replicate_pytree",
    "replicated",
    "shard_batch",
    "make_parallel_eval_step",
    "make_parallel_train_step",
]
