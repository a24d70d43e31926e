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
# This VM advertises AVX-512 in cpuid but faults on (some of) it: XLA:CPU
# intermittently SIGSEGVs inside compile-and-load deep into long suites, and
# cache loads warn "Machine type ... doesn't match ... could lead to SIGILL".
# Cap the ISA so the JIT never emits the unsupported instructions.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
).strip()

import jax  # noqa: E402

# The axon TPU-tunnel plugin prepends itself to jax_platforms regardless of
# the env var (it becomes "axon,cpu"); force the config explicitly or the
# whole suite silently runs over the TPU tunnel (every compile is a remote
# round trip, every sync 22 ms — PLATFORM.md §1).
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

jax.config.update("jax_enable_x64", False)
# NO persistent compile cache on CPU: XLA:CPU AOT serialization is unsafe on
# this host (cross-machine feature mismatch on load — "+prefer-no-scatter
# ... could lead to SIGILL" — and a reproducible segfault inside
# executable.serialize() when writing the fused-scan program). Repeat runs
# pay the compile; correctness beats speed here.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU aborts (silently, inside backend_compile_and_load) when one
    process accumulates several hundred large compiled programs — the full
    suite reproducibly died around test ~145 compiling the fused tracking
    scan, while every module passes standalone. Dropping the executable
    caches at module boundaries bounds the accumulation; modules recompile
    what they need (the suite is cold-compile anyway, see the cache note
    above)."""
    yield
    jax.clear_caches()
