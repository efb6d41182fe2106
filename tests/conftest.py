"""Test env: CPU backend with 8 virtual devices (SURVEY.md §4).

Tests must be deterministic and runnable without TPU hardware: the CPU
backend simulates an 8-device mesh for every distributed path
(``shard_map``/``psum``/``ppermute``), and Pallas kernels run in interpret
mode when not on TPU (handled inside tpuvr.kernels). float64 is enabled for
oracle/gradcheck precision.
"""

import os

# NOTE: the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the
# environment, so the CPU backend must be forced through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# XLA compiles cost ~0.5 s each on this host; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuvr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
