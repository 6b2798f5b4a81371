"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated via XLA's host-platform device virtualization
so tests never need TPU hardware. Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container boot forces JAX_PLATFORMS=axon (TPU); override for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
