"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
import so sharding tests exercise a real multi-device mesh without TPUs
(the strategy called for in SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the 'axon' TPU platform and
# prepends it to jax_platforms regardless of the env var; force CPU after
# import (backends initialize lazily, so this is still early enough).
jax.config.update("jax_platforms", "cpu")

# XLA:CPU compiles dominate suite wall-clock; persist them across runs.
# Dedicated tests dir: /tmp/jax_cache may hold TPU-era AOT entries
# compiled on another machine (SIGILL gotcha, CLAUDE.md).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
