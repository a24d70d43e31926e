"""Test configuration: hermetic CPU backend.

The whole suite runs on CPU (the TPU tunnel is slow to compile against and
uses bf16 default matmuls). NOTE: this host has 2 cores; forcing
--xla_force_host_platform_device_count=8 here deadlocks XLA-CPU's thread
pools randomly, so the main suite is single-device and multi-device sharding
semantics are exercised in dedicated subprocess tests (tests/test_parallel.py)
with a small virtual device count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU-tunnel plugin prepends itself to jax_platforms regardless of
# the env var (it becomes "axon,cpu"); force the config explicitly or the
# whole suite silently runs over the TPU tunnel (every compile is a remote
# round trip, every sync 22 ms — PLATFORM.md §1).
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: repeat test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
