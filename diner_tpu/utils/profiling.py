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


def assert_honest_sync(min_floor_s: float = 0.0) -> float:
    """Timing-honesty guard: measure a trivial jitted program with the same
    sync path ``time_fn`` uses and verify the measurement machinery blocks.

    On the TPU relay a trivial program still pays the fixed per-call RPC
    latency (~tens of ms); a measured time of ~0 would mean the sync became
    a no-op and every downstream number is fiction. Callers on the relay
    should pass ``min_floor_s`` (e.g. 1e-3); on local backends the check
    reduces to "sync returns a real value and time is positive".

    Returns the measured trivial-program time in seconds.
    """
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.ones((8,), jnp.float32)
    val = sync(f(x))  # warms up AND validates the value round-trips
    assert val == 24.0, f"sync returned wrong value {val}"
    t0 = time.perf_counter()
    for i in range(3):
        sync(f(x + i))  # vary input: relay result caches can't serve it
    dt = (time.perf_counter() - t0) / 3
    assert dt > min_floor_s, (
        f"trivial-program synced time {dt * 1e3:.3f} ms is below the floor "
        f"{min_floor_s * 1e3:.3f} ms — the host sync is not blocking; "
        "timing numbers would be meaningless")
    return dt
