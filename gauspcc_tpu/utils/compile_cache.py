"""Persistent XLA compilation cache for long-running drivers.

Compiles over the tunneled TPU backend are expensive (minutes cold) and a
hung compile mid-run costs a whole watchdog cycle; a persistent cache
makes every retry and every later process start warm. bench.py has set
this up since round 3 — but the soak/train/codec CLIs did not, so a
watchdog-restarted soak recompiled everything from scratch (observed
2026-08-19, runs/soak_hac_r4c.log: attempt 1 stalled 600 s inside the
adaptive-cap K=1024 recompile that a cache would have made instant on
retry). Call enable() before creating any jitted program.

The cache directory is keyed by the host CPU fingerprint: XLA:CPU AOT
blobs are not portable across machines (SIGILL loader warnings when the
flags differ), and this repo travels between hosts.
"""

from __future__ import annotations

import hashlib
import os
import platform

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".."))


def cache_dir() -> str:
    try:
        info = open("/proc/cpuinfo").read()
        flags = next(
            (l for l in info.splitlines() if l.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return os.path.join(_REPO_ROOT, f".jax_cache-{tag}")


def enable() -> str:
    """Point JAX's compilation cache at the repo-local directory.

    Idempotent; respects a pre-set JAX_COMPILATION_CACHE_DIR. Returns the
    directory in effect.
    """
    path = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir())
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache even small/fast-compiling programs: over the tunneled backend
    # the round-trip, not local compile time, dominates.
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except AttributeError:  # older jax: keep the default threshold
        pass
    return path
