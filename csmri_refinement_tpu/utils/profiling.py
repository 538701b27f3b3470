"""Profiling hooks.

The reference's observability is wall-clock epoch timing only (SURVEY.md
§5.1); here device-level tracing is first-class: ``trace(dir)`` wraps a
scope in a `jax.profiler` trace viewable in TensorBoard/Perfetto, and
``StepTimer`` gives cheap per-step host-side timings with summary stats.
"""

import contextlib
import functools
import logging
import time

import numpy as np


def timed_scan(fn, x, iters=8, warmup=2, args=()):
  """Seconds per iteration of ``fn`` (same-shaped in/out) on-device.

  The only reliable timing idiom on remote/tunneled TPU backends (NOTES.md):
  each timed quantity is a single compiled ``lax.scan`` whose iterations are
  data-dependent, ended by a float32 scalar fetch — ``block_until_ready``
  alone does not guarantee execution there. Per-iteration cost is the slope
  between a short and a long chain (subtracts dispatch/fetch overhead); each
  run perturbs the input so a result-caching backend cannot serve a stale
  execution; the reported value is the median of three slopes.

  Large device arrays ``fn`` needs besides ``x`` must go through ``args``
  (passed as ``fn(x, *args)``), NOT lexical closure: closure-captured
  arrays are baked into the program as constants, and the tunneled
  remote-compile endpoint rejects oversized request bodies (HTTP 413 at
  ~hundreds of MB).
  """
  import jax
  import jax.numpy as jnp

  @functools.partial(jax.jit, static_argnames='n')
  def loop(x, eps, *extra, n):
    def body(c, _):
      y = fn(c, *extra)
      return y.astype(c.dtype), None
    out, _ = jax.lax.scan(body, x + eps, None, length=n)
    return jnp.sum(out.astype(jnp.float32))

  float(loop(x, 0.0, *args, n=warmup))
  float(loop(x, 0.0, *args, n=warmup + iters))
  slopes = []
  for i in range(3):
    eps = 1e-6 * (i + 1)
    t0 = time.perf_counter()
    float(loop(x, eps, *args, n=warmup))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(x, 2 * eps, *args, n=warmup + iters))
    elapsed = time.perf_counter() - t0
    slopes.append(max(elapsed - base, 1e-9) / iters)
  return sorted(slopes)[1]


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
