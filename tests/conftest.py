"""Test configuration: force CPU with a virtual 8-device mesh.

Mirrors the reference's lack of device-dependence in tests (it has none —
SURVEY.md §4); we run the whole stack on CPU so the suite is hermetic, and
expose 8 virtual devices so multi-chip sharding semantics are tested without
a pod (SURVEY.md §4 "distributed tests on CPU").
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: repeat test runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
