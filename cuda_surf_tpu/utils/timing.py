"""Timing / profiling harness.

TPU analogue of the reference's cpuTimer/GpuTimer (cuda_utils.h:71-108):
wall-clock timing around `jax.block_until_ready`, plus named-scope and
jax.profiler trace helpers for xprof correlation (the analogue of the
reference's `-lineinfo` nvcc flag).
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Wall-clock timer that synchronizes on device results."""

    def __init__(self):
        self.elapsed_ms = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        return False


def benchmark(fn, *args, iters: int = 100, warmup: int = 3):
    """Run fn(*args) `iters` times, synchronizing once at the end
    (the reference's 100-iteration protocol, main.cpp:239-251).
    Returns mean milliseconds per iteration."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


@contextlib.contextmanager
def trace(name: str):
    """Named profiler scope (use with `jax.profiler.start_trace`)."""
    with jax.named_scope(name):
        yield
