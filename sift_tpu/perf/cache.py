"""Persistent XLA compilation cache setup.

The pipeline is one large XLA program; cold-process compiles take tens of
seconds on remote transports.  Enabling the persistent cache makes every
process after the first (tests, tools, the driver's bench run) start
near-instantly.  Call before the first jit trace.
"""

from __future__ import annotations

import hashlib
import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def _host_tag() -> str:
    """CPU-feature fingerprint.  XLA:CPU caches AOT machine code; an
    entry compiled on a host with a different instruction-set extension
    mix (e.g. AMX/AVX512 variants) SIGILL/segfaults when loaded here —
    observed as a mid-suite segfault after the repo cache had been
    written by a different machine.  Scoping the directory per feature
    set keeps the speedup without cross-host code reuse."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        " ".join(sorted(line.split()))
                        .encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the persistent cache for TPU-backed processes.

    CPU backends skip it by default (opt in with SIFT_TPU_CACHE_CPU=1):
    in this environment XLA:CPU executables are produced by a remote
    compile service for a different machine type, and their
    (de)serialization through the persistent cache segfaults
    intermittently under long test runs — observed crashes in both
    put_executable_and_time and get_executable_and_time.  TPU
    executables (the expensive, driver-critical compiles) serialize
    fine."""
    import jax

    plats = (getattr(jax.config, "jax_platforms", None)
             or os.environ.get("JAX_PLATFORMS") or "")
    if "cpu" in plats and not os.environ.get("SIFT_TPU_CACHE_CPU"):
        return None

    path = path or os.environ.get("SIFT_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    path = os.path.join(path, _host_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, including sub-second compiles (the default skips
    # entries under 1s, which covers most of the small test programs).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
