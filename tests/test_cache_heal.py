"""Self-healing of the persistent XLA compile cache (conftest.py).

A pytest session killed mid-cache-write (timeout/SIGKILL) can leave a
truncated cache entry that SEGFAULTS later runs during deserialization.
conftest drops a per-PID session marker and, on startup, deletes every
cache entry written during a session whose process is dead — the only
files that can be truncated.
"""
import os
import time

import pytest

import conftest


def _touch(path, mtime=None):
    open(path, "w").close()
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_dead_session_recent_entries_removed(tmp_path):
    cache = str(tmp_path)
    now = time.time()
    # entries written long before the dead session survive
    _touch(os.path.join(cache, "old_entry"), mtime=now - 3600)
    # a marker from a PID that cannot be alive (pid_max is < 2**22 + 1)
    marker = os.path.join(cache, ".session_running.4194305")
    _touch(marker, mtime=now - 60)
    # entries written during (or after) the dead session are suspect
    _touch(os.path.join(cache, "suspect_entry"), mtime=now - 30)

    conftest._heal_cache_dir(cache)

    assert os.path.exists(os.path.join(cache, "old_entry"))
    assert not os.path.exists(os.path.join(cache, "suspect_entry"))
    assert not os.path.exists(marker)


def test_live_session_untouched(tmp_path):
    cache = str(tmp_path)
    now = time.time()
    marker = os.path.join(cache, f".session_running.{os.getpid()}")
    _touch(marker, mtime=now - 60)
    _touch(os.path.join(cache, "fresh_entry"), mtime=now - 30)

    conftest._heal_cache_dir(cache)

    assert os.path.exists(os.path.join(cache, "fresh_entry"))
    assert os.path.exists(marker)  # live session's marker stays


def test_malformed_marker_ignored(tmp_path):
    cache = str(tmp_path)
    _touch(os.path.join(cache, ".session_running.notapid"))
    _touch(os.path.join(cache, "entry"))
    conftest._heal_cache_dir(cache)
    assert os.path.exists(os.path.join(cache, "entry"))


def test_own_session_left_marker():
    """The running session registered its own marker at import."""
    assert os.path.exists(conftest._MARKER)


@pytest.mark.skipif(not os.path.exists("/proc/1/stat"),
                    reason="needs /proc for start-time disambiguation")
def test_pid_reuse_detected_via_start_time(tmp_path):
    """A dead session whose PID was recycled by an unrelated live process
    must still heal: the marker's recorded start time disagrees with the
    live process's, so the session is dead and its suspect entries go."""
    from lipreading_video_generation_tpu.utils import compile_cache as cc

    cache = str(tmp_path)
    now = time.time()
    marker = os.path.join(cache, ".session_running.1")  # PID 1 is alive
    with open(marker, "w") as f:
        f.write("999999999999")  # not PID 1's real start time
    os.utime(marker, (now - 60, now - 60))
    _touch(os.path.join(cache, "suspect_entry"), mtime=now - 10)

    cc.heal_cache_dir(cache)

    assert not os.path.exists(os.path.join(cache, "suspect_entry"))
    assert not os.path.exists(marker)


@pytest.mark.skipif(not os.path.exists("/proc/1/stat"),
                    reason="needs /proc for start-time disambiguation")
def test_matching_start_time_is_live(tmp_path):
    """A marker whose PID and recorded start time both match a live
    process is a live session — its writes stay."""
    from lipreading_video_generation_tpu.utils import compile_cache as cc

    cache = str(tmp_path)
    now = time.time()
    pid = os.getpid()
    marker = os.path.join(cache, f".session_running.{pid}")
    with open(marker, "w") as f:
        f.write(cc.proc_start_time(pid) or "")
    os.utime(marker, (now - 60, now - 60))
    _touch(os.path.join(cache, "recent_entry"), mtime=now - 10)

    cc.heal_cache_dir(cache)

    assert os.path.exists(os.path.join(cache, "recent_entry"))
    assert os.path.exists(marker)


def test_cpu_platform_cache_is_machine_keyed(tmp_path):
    """On an XLA:CPU session (this suite) the cache lands in a per-machine
    subdirectory: CPU cache entries embed host-ISA AOT code, and loading
    them on a host with a different feature set can SIGILL."""
    import jax

    from lipreading_video_generation_tpu.utils import compile_cache as cc

    assert (jax.config.jax_platforms or "").split(",")[0] == "cpu"
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        marker = cc.enable_persistent_cache(str(tmp_path / "c"))
        assert os.path.dirname(marker) == os.path.join(
            str(tmp_path), "c", cc.machine_tag())
        # the tag is a stable fingerprint, not a per-call nonce
        assert cc.machine_tag() == cc.machine_tag()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_bytes)


def test_machine_tag_uses_xla_target_fingerprint():
    """On a CPU session the tag must come from XLA's own compile-machine
    identity (canary executable: triple + cpu + full LLVM feature string,
    tuning features included) — the cpuinfo fallback provably missed a
    ``+prefer-no-gather`` tuning mismatch in the round-4 driver dryrun."""
    from lipreading_video_generation_tpu.utils import compile_cache as cc

    fp = cc.xla_cpu_target_fingerprint()
    assert fp is not None and len(fp) == 10
    int(fp, 16)  # hex digest
    assert fp == cc.xla_cpu_target_fingerprint()  # stable, not a nonce
    assert cc.machine_tag() == "x" + fp


def test_heartbeat_preserves_completed_entries(tmp_path):
    """A killed session with heartbeats (touch_marker after each test) only
    loses entries from the final heartbeat window — entries completed
    before the last heartbeat survive healing."""
    from lipreading_video_generation_tpu.utils import compile_cache as cc

    cache = str(tmp_path)
    now = time.time()
    marker = os.path.join(cache, ".session_running.4194305")
    _touch(marker, mtime=now - 600)            # session start
    _touch(os.path.join(cache, "early_entry"), mtime=now - 300)
    # heartbeat advanced the marker AFTER early_entry was fully written
    os.utime(marker, (now - 60, now - 60))
    # this entry was mid-write at kill time (newer than the last heartbeat)
    _touch(os.path.join(cache, "truncated_entry"), mtime=now - 10)

    cc.heal_cache_dir(cache)

    assert os.path.exists(os.path.join(cache, "early_entry"))
    assert not os.path.exists(os.path.join(cache, "truncated_entry"))
    assert not os.path.exists(marker)


def test_heal_does_not_recurse_into_subdirectories(tmp_path):
    """Per-machine subdirectories are independent cache dirs with their own
    markers: healing a dead marker in the parent must not delete entries a
    live session is writing in a subdir."""
    from lipreading_video_generation_tpu.utils import compile_cache as cc

    cache = str(tmp_path)
    now = time.time()
    marker = os.path.join(cache, ".session_running.4194305")  # dead session
    _touch(marker, mtime=now - 60)
    _touch(os.path.join(cache, "parent_suspect"), mtime=now - 30)
    sub = os.path.join(cache, cc.machine_tag())
    os.makedirs(sub)
    _touch(os.path.join(sub, "live_subdir_entry"), mtime=now - 10)

    cc.heal_cache_dir(cache)

    assert not os.path.exists(os.path.join(cache, "parent_suspect"))
    assert os.path.exists(os.path.join(sub, "live_subdir_entry"))
