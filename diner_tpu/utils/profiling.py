"""Profiling / tracing harness (TPU-native).

Replaces the reference's single profiling hook — TransMVSNet's
``--mode profile`` chrome-trace export (``deps/TransMVSNet/train.py:321-349``)
— with the JAX equivalents: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, wall-time measurement with forced host sync (this
environment's TPU relay does not block in ``block_until_ready``; see
BENCH.md), and per-program XLA cost analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace: `with trace('logs/trace'): step(...)`,
    then open in TensorBoard (or upload the .pb to Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> float:
    """Force device completion by pulling one scalar to the host."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 5,
            vary: Optional[Callable] = None) -> Dict[str, float]:
    """Wall-time a jitted function with honest synchronization.

    ``vary(args, i)`` should perturb the inputs per iteration so cached
    executions can't be served (see BENCH.md).
    """
    for i in range(warmup):
        a = vary(args, -1 - i) if vary else args
        sync(fn(*a))
    times = []
    for i in range(iters):
        a = vary(args, i) if vary else args
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        times.append(time.perf_counter() - t0)
    return {"min_s": min(times), "mean_s": sum(times) / len(times),
            "iters": iters}


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis (flops / bytes) of the compiled program —
    the analogue of `jit(...).lower().compile().cost_analysis()` the
    SURVEY prescribes."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis() or {}
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
            "transcendentals": float(ca.get("transcendentals", 0.0))}
