"""Profiling hooks.

The reference's observability is wall-clock epoch timing only (SURVEY.md
§5.1); here device-level tracing is first-class: ``trace(dir)`` wraps a
scope in a `jax.profiler` trace viewable in TensorBoard/Perfetto, and
``StepTimer`` gives cheap per-step host-side timings with summary stats.
"""

import contextlib
import logging
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir):
  """jax.profiler trace scope; no-op if log_dir is falsy."""
  if not log_dir:
    yield
    return
  import jax
  logging.info('Writing profiler trace to %s', log_dir)
  with jax.profiler.trace(log_dir):
    yield


class StepTimer:
  """Accumulates per-step wall times; reports mean/p50/p95."""

  def __init__(self, name='step'):
    self.name = name
    self.times = []
    self._start = None

  def __enter__(self):
    self._start = time.perf_counter()
    return self

  def __exit__(self, *exc):
    self.times.append(time.perf_counter() - self._start)

  def summary(self):
    if not self.times:
      return '{}: no samples'.format(self.name)
    arr = np.asarray(self.times)
    return ('{}: n={} mean={:.4f}s p50={:.4f}s p95={:.4f}s').format(
        self.name, len(arr), arr.mean(), np.percentile(arr, 50),
        np.percentile(arr, 95))
