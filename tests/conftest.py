"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (SURVEY.md §4 test strategy).

Forced, not defaulted: some environments bake a TPU plugin selection into
the shell env (e.g. JAX_PLATFORMS=axon) and register it from sitecustomize,
which would silently route the whole suite through a remote TPU. The
config.update below wins as long as it runs before first backend use, which
pytest's conftest import order guarantees.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: arena-step compiles dominate test wall time.
# Per-user path (not shared /tmp) so multi-user hosts don't collide.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running multi-process / long-horizon tests")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow-marked tests (golden replays, multihost, "
             "learner e2e); `pytest tests/ --runslow` is the full "
             "acceptance pass, the default run is the fast CI pass")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    import pytest
    skip_slow = pytest.mark.skip(reason="slow: needs --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
