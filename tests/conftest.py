"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
import so sharding tests exercise a real multi-device mesh without TPUs
(the strategy called for in SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on the virtual CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU in-process collectives rendezvous aborts the WHOLE process
# ("Fatal Python error: Aborted") when one of the 8 device threads is
# starved past the default terminate timeout — which happens ~1-in-3 full
# suite runs on this 1-core host (CLAUDE.md gotcha). Raise the rendezvous
# timeouts so starvation bursts stall instead of killing the run.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=150"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
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


def host_busy_factor() -> float:
    """1-min loadavg per core, floored at 1.0 — slow-tier subprocess
    tests scale their first-step deadlines by this so a contended host
    stalls instead of flaking (VERDICT r4 next #8)."""
    try:
        load = os.getloadavg()[0]
    except OSError:  # pragma: no cover — non-POSIX
        return 1.0
    cores = os.cpu_count() or 1
    return max(1.0, min(4.0, load / cores))


@pytest.fixture(autouse=True)
def _slow_tier_exclusive(request):
    """Machine-wide serialization of slow-tier tests (VERDICT r4 next
    #8): the round-4 preemption flakes were self-inflicted same-core
    contention between the slow tier and other jax work. Every
    ``slow``-marked test takes an exclusive flock on a well-known
    lockfile, so concurrent pytest sessions (or a concurrent dryrun
    launched through the same guard) queue up instead of starving each
    other's XLA:CPU collective rendezvous."""
    if request.node.get_closest_marker("slow") is None:
        yield
        return
    import fcntl
    with open("/tmp/sgfr_slow_tier.lock", "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)
