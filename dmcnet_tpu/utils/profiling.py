"""Profiling / tracing helpers.

The reference exposes only wall-clock meters (AverageMeter batch/data time,
SpeedMonitor samples/sec — SURVEY.md §5).  Here the same counters exist
(train.metrics / train.callback) plus first-class XLA profiling:

  with trace("/tmp/tb"):          # XLA trace viewable in TensorBoard/xprof
      run_steps()

  with step_timer() as t:         # device-synchronized section timing
      state, m = train_step(...)
  print(t.elapsed)
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    """jax.profiler trace context (device + host timeline)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class _Timer:
    elapsed = 0.0


@contextlib.contextmanager
def step_timer(sync=None):
    """Wall-clock timer that blocks on `sync` (an array/pytree) before
    stopping, so async dispatch doesn't fake the number."""
    t = _Timer()
    start = time.perf_counter()
    try:
        yield t
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        t.elapsed = time.perf_counter() - start


def annotate(name):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
