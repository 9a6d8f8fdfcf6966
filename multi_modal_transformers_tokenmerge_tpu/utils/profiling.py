"""Profiling & timing utilities (reference has none — SURVEY.md §5 row 1).

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/XPlane trace directory.
* :func:`time_fn` — jit-aware latency/throughput measurement: block on
  readiness, discard compile, report percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np

__all__ = ["trace", "time_fn"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block(x):
    jax.tree.map(
        lambda leaf: leaf.block_until_ready()
        if hasattr(leaf, "block_until_ready") else leaf, x)
    return x


def time_fn(fn: Callable, *args, iters: int = 30, warmup: int = 3,
            **kwargs) -> Dict[str, float]:
    """Measure steady-state latency of ``fn(*args, **kwargs)``.

    Runs ``warmup`` untimed calls (compile + cache), then ``iters`` timed
    calls with ``block_until_ready``.  Returns seconds: p50/p90/p99/mean.
    """
    for _ in range(warmup):
        _block(fn(*args, **kwargs))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        samples.append(time.perf_counter() - t0)
    s = np.asarray(samples)
    return {
        "p50": float(np.percentile(s, 50)),
        "p90": float(np.percentile(s, 90)),
        "p99": float(np.percentile(s, 99)),
        "mean": float(s.mean()),
        "iters": iters,
    }
