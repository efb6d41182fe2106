"""Test env: CPU backend with 8 virtual devices (SURVEY.md §4).

Tests must be deterministic and runnable without TPU hardware: the CPU
backend simulates an 8-device mesh for every distributed path
(``shard_map``/``psum``/``ppermute``), and Pallas kernels run in interpret
mode when not on TPU (handled inside tpuvr.kernels). float64 is enabled for
oracle/gradcheck precision.
"""

import os

# On-chip lane: TPUVR_TPU_TESTS=1 leaves the real TPU backend up so the
# `-m tpu` tests (tests/test_tpu_onchip.py) run the Pallas kernels
# COMPILED (Mosaic) instead of interpreted:
#     TPUVR_TPU_TESTS=1 python -m pytest tests -m tpu -q
# Everything else (the default CI lane) forces the CPU backend with 8
# virtual devices.
_TPU_LANE = os.environ.get("TPUVR_TPU_TESTS") == "1"

# NOTE: the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the
# environment, so the CPU backend must be forced through jax.config below.
if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Real multi-process lane (tools/run_multihost_cpu.py): N CPU processes on
# localhost under jax.distributed, so tests/test_multihost.py exercises a
# true process boundary (process_count >= 2) without TPU pod hardware.
_MH_PROC = os.environ.get("TPUVR_MH_PROC")
if _MH_PROC is not None and not _TPU_LANE:
    jax.distributed.initialize(
        coordinator_address=os.environ["TPUVR_MH_COORD"],
        num_processes=int(os.environ["TPUVR_MH_NPROC"]),
        process_id=int(_MH_PROC),
    )
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
