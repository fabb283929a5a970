"""Make the ``JAX_PLATFORMS`` environment variable authoritative.

Some PJRT plugins (e.g. relay-backed TPU plugins registered from a
``sitecustomize`` hook) pin the platform at import time, silently
overriding a ``JAX_PLATFORMS=cpu`` the user set for a host-side run.
Calling :func:`respect_env_platform` from a CLI entry point before any
computation re-asserts the user's choice in-process (the same thing
``tests/conftest.py`` does for the test suite).
"""

from __future__ import annotations

import os


def respect_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS", "")
    if not env:
        return
    import jax

    try:
        jax.config.update("jax_platforms", env)
    except Exception:
        pass  # unknown platform string: leave jax's own error handling to it


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (best effort).

    Remote compiles on the TPU relay cost minutes per graph; caching the
    serialized executables on disk makes re-runs of the same CLI start in
    seconds. Harmless when the backend does not support serialization
    (every lookup just misses). Call from CLI entry points before the
    first jit.
    """
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: skip silently
