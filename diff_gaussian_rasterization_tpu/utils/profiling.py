"""Profiling helpers (the reference has none; SURVEY.md §5).

Thin wrappers over jax.profiler so SLAM loops can be traced on TPU with
zero setup: annotate hot sections, dump traces viewable in TensorBoard /
Perfetto, and time jitted callables with proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax


annotate = jax.profiler.TraceAnnotation  # with annotate("track_frame"): ...


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Wall-clock a jitted callable with blocking, returns seconds/iter."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
