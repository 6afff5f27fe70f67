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

# Persistent compile cache for the test suite. Two reasons:
#  1. JAX compiles dominate suite wall time (~15 min cold); warm runs
#     load executables from disk instead.
#  2. jaxlib's CPU backend_compile SEGFAULTS once a single process has
#     compiled enough large programs (reproduced deterministically
#     around the ~56th-60th test across three suite orderings — always
#     inside backend_compile_and_load, never in any module run alone).
#     Cached loads skip the crashing code path, so a warm cache keeps
#     the full suite under the in-process compile budget. The two
#     compile-heaviest tests (the KF-capacity soak, the knob-parity
#     sweep) additionally run in fresh subprocesses.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/plslam_tpu_xla_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
