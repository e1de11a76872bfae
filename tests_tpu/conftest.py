"""Hardware-gated tests: run on the REAL device backend (TPU), unlike
tests/ which pins the CPU backend.  The suite self-skips when no TPU is
attached, so `pytest tests_tpu/` is safe everywhere and meaningful on
silicon — it gates the Mosaic-lowered device semantics (whole-slot DMA
semaphore waits, dynamic-trip rings, unaligned sublane slices) that
interpret-mode tests structurally cannot catch.

Invoke directly: `python -m pytest tests_tpu/ -q` (NOT part of the
default `pytest tests/` CI path)."""

import jax
import pytest

from sift_tpu.perf.cache import enable_compilation_cache

enable_compilation_cache()


def pytest_collection_modifyitems(config, items):
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "none"
    if platform in ("tpu", "axon"):
        return
    skip = pytest.mark.skip(reason=f"needs TPU hardware (got {platform})")
    for item in items:
        item.add_marker(skip)
