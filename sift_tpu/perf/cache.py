"""Persistent XLA compilation cache setup.

The pipeline is one large XLA program; cold-process compiles take tens of
seconds on remote transports.  Enabling the persistent cache makes every
process after the first (tests, tools, the driver's bench run) start
near-instantly.  Call before the first jit trace.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("SIFT_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, including sub-second compiles (the default skips
    # entries under 1s, which covers most of the small test programs).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
