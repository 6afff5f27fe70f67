"""Pytest root config: run all tests on a simulated 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and selects
it programmatically, so setting JAX_PLATFORMS in the environment is not
enough — we must override jax's config after import, before any backend
initializes. XLA_FLAGS must still be set before the CPU client spins up.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
