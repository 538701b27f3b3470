#!/usr/bin/env python
"""DC lowering shoot-out at 512^2 B128 (the paper resolution).

Component table shows one DC = 22.5 ms at 512 B128 vs 1.05 ms at 256 —
5x worse than FLOP scaling. Compares radix bases (dense 512 vs one/two
split levels) and the raw GEMM floor.

    python scripts/perf_dc512.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.utils.profiling import timed_scan

B, S = 128, 512


def main():
  from csmri_refinement_tpu.ops import dc as dc_ops
  from csmri_refinement_tpu.ops import fft as jfft

  print('backend:', jax.default_backend(), flush=True)
  x = jax.jit(lambda: 0.1 * jax.random.normal(
      jax.random.PRNGKey(0), (B, S, S, 2), jnp.float32))()
  k0 = jax.jit(lambda: 0.1 * jax.random.normal(
      jax.random.PRNGKey(1), (B, S, S, 2), jnp.float32))()
  mask = jax.jit(lambda: (jax.random.uniform(
      jax.random.PRNGKey(2), (B, S, S, 1)) < 0.3).astype(jnp.float32))()

  def dc(v, k, m):
    return dc_ops._dc_einsum(v, k, m)

  for base in (512, 256, 128):
    jfft._RADIX_BASE = base
    secs = timed_scan(dc, x, args=(k0, mask))
    print('dc einsum radix_base={:4d}: {:7.2f} ms'.format(base, secs * 1e3),
          flush=True)
  jfft._RADIX_BASE = 256

  # raw GEMM floor: the 8 split-real GEMMs of one 512-split axis, x4 axes
  fr = jax.jit(lambda: jax.random.normal(
      jax.random.PRNGKey(3), (256, 256), jnp.float32))()

  def gemm_axis(v, f):
    # row-transform shape: (B, 256, 512) halves, 4 GEMMs x 2 halves
    h = v[:, 0::2, :1, 0] * 0  # keep carry shape; not the point
    a = v[:, 0::2, :, 0]
    out = None
    for _ in range(8):
      r = jnp.einsum('hk,bkw->bhw', f, a, precision='high')
      out = r if out is None else out + r
    return v + out[:, :, :, None] * 1e-6

  secs = timed_scan(gemm_axis, x, args=(fr,))
  print('8 split-real GEMMs (1 axis eq): {:7.2f} ms'.format(secs * 1e3),
        flush=True)

  # strided slice + concat cost alone
  def slice_concat(v):
    e = v[:, 0::2, :, :]
    o = v[:, 1::2, :, :]
    return jnp.concatenate([e + o * 1.0001, e - o], axis=1)

  secs = timed_scan(slice_concat, x)
  print('even/odd slice+concat (1 axis): {:7.2f} ms'.format(secs * 1e3),
        flush=True)


if __name__ == '__main__':
  main()
