"""Test config: force an 8-device CPU mesh before JAX initializes.

This is the standard JAX trick for testing pjit/sharding without TPU
hardware (SURVEY.md §4): tests exercising multi-chip sharding see 8 virtual
CPU devices; kernel-numerics tests just run on CPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu"
# via jax.config, overriding the env var — override it back so the test
# suite runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# JAX 0.9 defaults f32 matmuls to bf16-grade precision even on CPU; tests
# compare against float64/numpy goldens, so pin full fp32 matmul precision.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA-CPU compiles of the bigger models take
# minutes on this box; cache them across test runs.
#
# Self-healing against kill-during-write corruption: a pytest run killed
# mid-cache-write (timeout/SIGKILL) can leave a truncated entry whose
# deserialization SEGFAULTS a later run inside
# jax compilation_cache.get_executable_and_time. Each session drops a
# per-PID marker in the cache dir; on startup, a marker whose process is
# dead means that session was killed, so every cache entry written since
# that marker's creation (the only files that can be truncated) is deleted
# before JAX reads anything.
_CACHE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))


# Shared implementation (also used by __graft_entry__.dryrun_multichip and
# any non-pytest entrypoint that wants the same healing protocol).
from lipreading_video_generation_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
    heal_cache_dir,
    pid_alive as _pid_alive,
)


def _heal_cache_dir(cache_dir: str = _CACHE_DIR) -> None:
    heal_cache_dir(cache_dir)


_MARKER = enable_persistent_cache(_CACHE_DIR)


def pytest_sessionfinish(session, exitstatus):
    try:
        os.remove(_MARKER)
    except OSError:
        pass


def pytest_runtest_logfinish(nodeid, location):
    """Heartbeat after every test: entries cached before this instant are
    known-complete, so a later timeout-kill only invalidates the final
    heartbeat window of cache writes, not the whole run's."""
    from lipreading_video_generation_tpu.utils.compile_cache import touch_marker

    touch_marker(_MARKER)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-process compiled executables after each test module.

    A full slow-tier run accumulates dozens of large XLA-CPU executables in
    one process and has been observed to segfault inside XLA late in the
    run; the persistent disk cache makes re-reads cheap, so bounding
    in-process growth costs little."""
    yield
    jax.clear_caches()
