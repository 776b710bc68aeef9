"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (SURVEY.md §4 test strategy)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: arena-step compiles dominate test wall time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rlgymppo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
