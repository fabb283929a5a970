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
