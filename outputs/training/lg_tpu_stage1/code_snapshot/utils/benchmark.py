"""Warmup+timed forward benchmarking (reference: gluefactory/utils/benchmark.py:7-33).

Thin functional wrapper over eval/timing_measurement.measure_pipeline for
library use; see that module for the forced-execution methodology."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def benchmark(fn, inputs, num_iters: int = 10, warmup: int = 3) -> dict:
    """Time ``fn(*inputs)`` with forced execution via an on-device checksum.
    Returns {'time_per_iter_ms', 'iters_per_s'}."""

    def summed(*args):
        out = fn(*args)
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    jitted = jax.jit(summed)
    for _ in range(warmup):
        float(jitted(*inputs))
    t0 = time.perf_counter()
    vals = [jitted(*inputs) for _ in range(num_iters)]
    _ = [float(v) for v in vals]
    dt = time.perf_counter() - t0
    return {
        "time_per_iter_ms": dt / num_iters * 1000.0,
        "iters_per_s": num_iters / dt,
    }
