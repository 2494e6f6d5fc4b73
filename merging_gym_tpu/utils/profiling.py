"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md section 5) -- its only
timing construct is the 50 ms render pacing.  Here:

* :func:`trace` -- context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace (XLA ops, fusion, HBM traffic);
* :class:`ThroughputTimer` -- env-steps/s measurement with proper
  ``block_until_ready`` fencing and warmup discard, the harness behind
  bench.py and benchmarks/run_benchmarks.py;
* :func:`time_fn` -- one-shot compile-then-time helper.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace: view with TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputTimer:
    """Accumulate (items, seconds) intervals; report items/s."""

    def __init__(self):
        self.items = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int, *sync_arrays):
        for a in sync_arrays:
            jax.block_until_ready(a)
        assert self._t0 is not None
        self.seconds += time.perf_counter() - self._t0
        self.items += items
        self._t0 = None

    @property
    def per_second(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0


def time_fn(fn, *args, iters: int = 5, warmup: int = 1):
    """Compile + time a jitted fn; returns (mean_seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
