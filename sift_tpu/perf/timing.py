"""Latency measurement that is correct over asynchronous/remote device
transports.

``jax.block_until_ready`` does not guarantee device completion on every
PJRT transport (observed: the tunneled TPU backend acknowledges dispatch
before execution, and a host readback costs ~27 ms round-trip).  The only
reliable clock is: chain K data-dependent iterations of the workload inside
ONE jitted program, read back one scalar, and take the slope between two
different K — fixed costs (dispatch, readback, the tunnel) cancel exactly.

This replaces the reference's CUDA-event-free wall timing (the reference
also excludes transfer time, readme.md:11) with a transport-robust
equivalent.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def chained_runner(step: Callable, k: int):
    """Build a jitted fn: img -> scalar, running ``step`` k times with a
    serializing data dependency.  ``step(x) -> (y, scalar_probe)`` where y
    has x's shape/dtype (the carried value) and scalar_probe forces every
    stage of the step to execute."""

    def body(_, carry):
        y, probe = step(carry)
        # The probe folds into the carry, making iteration i+1 depend on all
        # of iteration i.  The 1e-30 scale leaves f32 carries bit-identical
        # while (unlike *0.0) being impossible to simplify away.
        return y + probe * 1e-30

    def run(x):
        out = jax.lax.fori_loop(0, k, body, x)
        _, probe = step(out)
        return probe

    return jax.jit(run)


def chained_runner_dynamic(step: Callable):
    """Like chained_runner but the trip count is a TRACED argument: one
    compile serves every K (the two-point slope method costs a single
    XLA compilation — critical for cold-process benchmark runs)."""

    def body(_, carry):
        y, probe = step(carry)
        return y + probe * 1e-30

    def run(x, k):
        out = jax.lax.fori_loop(0, k, body, x)
        _, probe = step(out)
        return probe

    return jax.jit(run)


def measure_ms(step: Callable, x, k_small: int = 4, k_large: int = 24,
               repeats: int = 3, on_first_estimate: Callable = None) -> float:
    """Median per-iteration latency in ms via the two-point K method.

    One compiled program (traced trip count).  ``on_first_estimate``,
    if given, receives a rough per-iteration estimate (wall-clock/K,
    fixed costs NOT cancelled) as soon as the first timed run finishes —
    benchmark watchdogs use it as a fallback result."""
    import jax.numpy as jnp

    f = chained_runner_dynamic(step)
    ks = jnp.asarray(k_small, jnp.int32)
    kl = jnp.asarray(k_large, jnp.int32)
    float(f(x, kl))  # compile + warm-up

    t0 = time.perf_counter()
    float(f(x, kl))
    if on_first_estimate is not None:
        on_first_estimate((time.perf_counter() - t0) * 1e3 / k_large)

    def run(karg):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(x, karg))
            best = min(best, time.perf_counter() - t0)
        return best

    t_large = run(kl)
    t_small = run(ks)
    if t_large <= t_small:
        # Transport noise burst (observed: a single stalled round-trip
        # inflates t_small past t_large, yielding a nonsense ~0 slope).
        # One full retry of both points beats reporting garbage.
        t_large = run(kl)
        t_small = run(ks)
    return max(t_large - t_small, 1e-9) * 1e3 / (k_large - k_small)
