"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding logic is exercised on CPU via
``--xla_force_host_platform_device_count=8`` (the JAX-native "multi-node
without a cluster" mechanism); kernels are numerically identical across
backends, and the driver separately compile-checks the TPU path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin and pin
# JAX_PLATFORMS before our env assignment is seen; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
