"""Self-healing persistent XLA compilation cache.

XLA-CPU compiles of the bigger models take minutes on small hosts and
remote-TPU compiles pay relay round trips, so every entrypoint (test
suite, CLI, bench scripts, the driver's multi-chip dryrun) shares a
persistent on-disk cache.

The healing protocol guards against kill-during-write corruption: a
process killed mid-cache-write (timeout/SIGKILL) can leave a truncated
entry whose deserialization SEGFAULTS a later run inside
``jax compilation_cache.get_executable_and_time``. Each session drops a
per-PID marker in the cache dir; on startup, a marker whose process is
dead means that session was killed, so every cache entry written since
that marker's creation (the only files that can be truncated) is deleted
before JAX reads anything.
"""
from __future__ import annotations

import atexit
import glob
import hashlib
import os
import platform
import re


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def proc_start_time(pid: int) -> str | None:
    """The process's kernel start time (clock ticks since boot) from
    /proc/<pid>/stat — the disambiguator for PID reuse. None when /proc
    isn't available (non-Linux) or the process is gone."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # comm (field 2) may contain spaces/parens; fields after the LAST
        # ')' start at state (field 3), so starttime (field 22) is index 19
        return stat.rsplit(")", 1)[1].split()[19]
    except (OSError, IndexError):
        return None


def session_alive(pid: int, recorded_start: str | None) -> bool:
    """A marker's session is alive iff its PID is alive AND (when both
    sides are known) the live process's start time matches the one the
    marker recorded — otherwise the PID was recycled by an unrelated
    process and the session is dead (PID reuse must not suppress healing:
    a truncated entry would survive and segfault later runs)."""
    if not pid_alive(pid):
        return False
    if recorded_start is None:
        return True  # old-format marker or non-Linux: pid-only check
    current = proc_start_time(pid)
    return current is None or current == recorded_start


def touch_marker(marker: str) -> None:
    """Heartbeat: advance the session marker's mtime. Entries written
    BEFORE the latest heartbeat are known-complete (cache writes happen
    serially inside the work the heartbeat brackets), so if the session is
    later killed, ``heal_cache_dir`` only discards entries from the final
    heartbeat window instead of the whole run — a timeout-killed test run
    keeps almost all of its compiles."""
    try:
        os.utime(marker, None)
    except OSError:
        pass


def heal_cache_dir(cache_dir: str) -> None:
    """Delete cache entries written by sessions that died mid-run (their
    ``.session_running.<pid>`` marker exists but the session is gone —
    PID dead, or PID recycled per the marker's recorded start time). Only
    entries newer than the marker's last heartbeat (see ``touch_marker``)
    can be truncated; older ones are kept.

    Known tradeoff: deletion is by timestamp, not ownership — if a LIVE
    session is writing concurrently while a dead marker is healed, valid
    entries the live session wrote after the dead session's last heartbeat
    are deleted too (they'll be re-compiled). Correctness (never read a
    possibly-truncated entry: deserialization can SEGFAULT) wins over
    availability here; the heartbeat bounds the loss to one window."""
    for marker in glob.glob(os.path.join(cache_dir, ".session_running.*")):
        try:
            pid = int(marker.rsplit(".", 1)[1])
        except ValueError:
            continue
        try:
            with open(marker) as f:
                recorded_start = f.read().strip() or None
        except OSError:
            recorded_start = None
        if session_alive(pid, recorded_start):
            continue  # a concurrent live session — leave its writes alone
        try:
            born = os.path.getmtime(marker)
        except OSError:
            continue
        # top-level files only: a marker guards the directory it sits in.
        # Per-machine subdirectories are separate cache dirs with their own
        # markers (healed when a session enters them) — recursing here would
        # let a dead TPU-session marker in the parent delete entries a live
        # CPU session is writing in its machine-tag subdir.
        try:
            names = os.listdir(cache_dir)
        except OSError:
            names = []
        for f in names:
            p = os.path.join(cache_dir, f)
            try:
                if not f.startswith(".session_running") and os.path.isfile(p) \
                        and os.path.getmtime(p) >= born - 1.0:
                    os.remove(p)
            except OSError:
                pass
        try:
            os.remove(marker)
        except OSError:
            pass


_FEATURES_RE = re.compile(rb"[+-][a-z0-9.\-]+(?:,[+-][a-z0-9.\-]+){3,}")


def xla_cpu_target_fingerprint() -> str | None:
    """The compile-machine identity XLA:CPU *actually* bakes into AOT
    executables, read back out of XLA itself: compile a trivial canary on
    the CPU backend, serialize it, and extract the LLVM target-feature
    string (plus the target triple + cpu name immediately preceding it in
    the blob). This is byte-for-byte the string ``cpu_aot_loader`` compares
    at load time — including pure *tuning* features like
    ``+prefer-no-gather`` that are set from LLVM's CPUID probe and never
    appear in /proc/cpuinfo (the round-4 dryrun's mismatch was exactly such
    a feature slipping past the cpuinfo fingerprint; MULTICHIP_r04 tail).

    Returns None when no CPU backend is primary or the serialized format
    stops exposing the feature list — callers fall back to the cpuinfo
    fingerprint. Deterministic across processes on a host (verified: the
    canary blob's feature/triple/cpu region is byte-stable)."""
    try:
        import jax
        import jax.numpy as jnp

        if jax.default_backend().lower() != "cpu":
            return None
        compiled = jax.jit(lambda x: x @ x).lower(
            jnp.ones((8, 8), jnp.float32)).compile()
        blob = bytes(compiled.runtime_executable().serialize())
    except Exception:
        return None
    m = _FEATURES_RE.search(blob)
    if m is None:
        return None
    # triple + cpu name sit just before the feature list (printable runs)
    head = blob[max(0, m.start() - 200):m.start()]
    context = b"|".join(re.findall(rb"[ -~]{4,}", head)[-2:])
    return hashlib.sha1(m.group(0) + b"|" + context).hexdigest()[:10]


def machine_tag() -> str:
    """A short fingerprint of the host's ISA feature set. XLA:CPU caches
    AOT-compiled executables specialized to the compiling machine's CPU
    features; loading them on a host with a different feature set logs
    "Machine type used for XLA:CPU compilation doesn't match" and can
    SIGILL. Sessions for this repo migrate across hosts, so the cache dir
    is keyed per-machine: a mismatched host recompiles instead of loading
    another machine's AOT blobs.

    Primary key: ``xla_cpu_target_fingerprint`` — XLA's own view of the
    compile machine (triple + cpu + full LLVM feature string, tuning
    features included), so the subdir key can never disagree with what the
    compiler actually targeted. Fallback (no CPU backend / format change):
    the /proc/cpuinfo identity fields (vendor/family/model/stepping/
    microcode/model name + flags).

    Known limitation (round-5 root cause of the MULTICHIP_r04 noise): the
    AOT *loader* compares the blob's compile-feature string against a
    host-CPUID probe whose vocabulary can never contain LLVM tuning
    features like ``+prefer-no-gather`` — so it logs a "Machine type ...
    doesn't match" error on every load, EVEN ON THE HOST THAT WROTE THE
    ENTRY. No cache keying can silence that (it is an upstream
    false-positive); this key's job is the real safety property — entries
    are only ever loaded on a host whose XLA target identity matches the
    writer's, so the tuning-feature complaint is provably noise and a true
    cross-ISA SIGILL cannot happen. Contexts that need a clean stderr
    (``__graft_entry__.dryrun_multichip``) use a throwaway cache dir
    instead, which never loads at all."""
    fp = xla_cpu_target_fingerprint()
    if fp is not None:
        return "x" + fp
    fields = {k: "" for k in (
        "flags", "Features", "model name", "vendor_id", "cpu family",
        "model", "stepping", "microcode")}
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first CPU block only — all cores match
                k, _, v = line.partition(":")
                k = k.strip()
                if k in fields and not fields[k]:
                    fields[k] = " ".join(sorted(v.split())) \
                        if k in ("flags", "Features") else v.strip()
    except OSError:
        pass
    ident = "|".join(fields[k] for k in sorted(fields))
    return "m" + hashlib.sha1(
        f"{platform.machine()}|{ident}".encode()).hexdigest()[:10]


def enable_persistent_cache(
    cache_dir: str,
    min_compile_secs: float = 0.5,
    min_entry_bytes: int = 0,
) -> str:
    """Heal ``cache_dir``, mark this session live (marker auto-removed at
    clean exit), and point JAX's persistent compilation cache at it.
    Returns the marker path.

    When the session's primary platform is XLA:CPU (tests, the driver's
    multi-chip dryrun), the effective directory is a per-machine
    subdirectory (see ``machine_tag``) — CPU entries embed host-ISA AOT
    code, TPU entries don't, so TPU caches stay shared across hosts and
    keep the relay bench warm."""
    import jax

    primary = (jax.config.jax_platforms or "").split(",")[0].strip().lower()
    if not primary:
        # autodetection (no JAX_PLATFORMS set): ask the resolved backend —
        # a TPU-less host still runs XLA:CPU and must machine-key its
        # entries, or it writes host-ISA AOT blobs into the shared dir
        primary = jax.default_backend().lower()
    if primary == "cpu":
        cache_dir = os.path.join(cache_dir, machine_tag())
    os.makedirs(cache_dir, exist_ok=True)
    heal_cache_dir(cache_dir)
    marker = os.path.join(cache_dir, f".session_running.{os.getpid()}")
    with open(marker, "w") as f:
        f.write(proc_start_time(os.getpid()) or "")

    def _cleanup(path=marker):
        try:
            os.remove(path)
        except OSError:
            pass

    atexit.register(_cleanup)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", min_entry_bytes)
    return marker
