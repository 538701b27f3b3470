#!/usr/bin/env python
"""Fused Pallas conv-chain kernel vs XLA conv envelope (real chip).

Targets the round-2 measured envelope (NOTES.md): k4 32->32 B128@256^2
= 3.34 ms / 82 TFLOPS on the XLA path. Usage:

    python scripts/perf_conv_kernel.py [c32|c64|c128|chain|zero ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.utils.profiling import timed_scan

BATCH = 128


def report(name, secs, flops=None):
  line = '{:46s} {:8.2f} ms'.format(name, secs * 1e3)
  if flops:
    line += '  {:7.1f} TFLOPS (useful)'.format(flops / secs / 1e12)
  print(line, flush=True)


def make(shape, key=1, dtype=jnp.bfloat16):
  return jax.jit(lambda: 0.1 * jax.random.normal(
      jax.random.PRNGKey(key), shape, dtype))()


def xla_conv(x, w, b, pad_mode):
  from csmri_refinement_tpu.models.layers import same_conv
  k = w.shape[0]
  def conv(p):
    y = jax.lax.conv_general_dilated(
        p, w.astype(x.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + b.astype(x.dtype)
  y = same_conv(conv, x, k, pad_mode)
  return jnp.where(y >= 0, y, jnp.asarray(0.2, x.dtype) * y)


def kernel_conv(x, w, b, pad_mode):
  from csmri_refinement_tpu.ops.conv_pallas import fused_conv_chain, ChainLayer
  return fused_conv_chain(x, (ChainLayer(w, b, 0.2),), pad_mode=pad_mode)


def probe(tag, c, size, k=4, pad_mode='reflection', chain=1):
  from csmri_refinement_tpu.ops.conv_pallas import fused_conv_chain, ChainLayer
  x = make((BATCH, size, size, c))
  w = make((k, k, c, c), key=2, dtype=jnp.float32)
  b = make((c,), key=3, dtype=jnp.float32)
  flops = 2 * BATCH * size * size * k * k * c * c * chain

  if chain == 1:
    import functools
    xla1 = functools.partial(xla_conv, pad_mode=pad_mode)
    pal1 = functools.partial(kernel_conv, pad_mode=pad_mode)
    report(tag + ' XLA', timed_scan(xla1, x, args=(w, b)), flops)
    report(tag + ' pallas', timed_scan(pal1, x, args=(w, b)), flops)
  else:
    def xla_n(x, w, b):
      for _ in range(chain):
        x = xla_conv(x, w, b, pad_mode)
      return x
    def pal_n(x, w, b):
      layers = tuple(ChainLayer(w, b, 0.2) for _ in range(chain))
      return fused_conv_chain(x, layers, pad_mode=pad_mode)
    report(tag + ' XLA x%d' % chain, timed_scan(xla_n, x, args=(w, b)), flops)
    report(tag + ' pallas fused x%d' % chain,
           timed_scan(pal_n, x, args=(w, b)), flops)


def probe_mixed(tag, specs, size, pad_mode='reflection'):
  """Chain with differing per-layer channel counts (e.g. U-Net s2)."""
  from csmri_refinement_tpu.ops.conv_pallas import fused_conv_chain, ChainLayer
  cin = specs[0][1]
  x = make((BATCH, size, size, cin))
  layers = tuple(ChainLayer(make((k, k, ci, co), key=7 + i, dtype=jnp.float32),
                            make((co,), key=17 + i, dtype=jnp.float32), 0.2)
                 for i, (k, ci, co) in enumerate(specs))
  flops = 2 * BATCH * size * size * sum(k * k * ci * co
                                        for k, ci, co in specs)

  def fit(y):
    # timed_scan carries the input shape: adapt the chain output's
    # channel count (slice or duplicate) while keeping data dependence
    co = y.shape[-1]
    if co >= cin:
      return y[..., :cin]
    reps = -(-cin // co)
    return jnp.concatenate([y] * reps, axis=-1)[..., :cin]

  def xla_n(x):
    for lay in layers:
      x = xla_conv(x, lay.kernel, lay.bias, pad_mode)
    return fit(x)

  def pal_n(x):
    return fit(fused_conv_chain(x, layers, pad_mode=pad_mode))

  report(tag + ' XLA', timed_scan(xla_n, x), flops)
  report(tag + ' pallas fused', timed_scan(pal_n, x), flops)


def main(argv):
  probes = argv or ['c32', 'chain', 'c64', 'c128']
  print('backend:', jax.default_backend(), flush=True)
  if 'c32' in probes:
    probe('k4 32->32 @256 reflect', 32, 256)
  if 'zero' in probes:
    probe('k4 32->32 @256 zero', 32, 256, pad_mode='zero')
  if 'k3' in probes:
    probe('k3 32->32 @256 reflect', 32, 256, k=3)
  if 'chain' in probes:
    probe('k4 32->32 @256 reflect', 32, 256, chain=2)
  if 'c64' in probes:
    probe('k4 64->64 @128 reflect', 64, 128)
  if 'c128' in probes:
    probe('k4 128->128 @64 reflect', 128, 64)
  if 'c128x2' in probes:
    probe('k4 128->128 @64 reflect', 128, 64, chain=2)
  if 's2' in probes:
    probe_mixed('s2 chain 64->128->128 @64', ((4, 64, 128), (4, 128, 128)),
                64)
  if 'd0' in probes:
    probe_mixed('d0 merge 128->64 @128', ((4, 128, 64),), 128)
  if 'd0chain' in probes:
    probe_mixed('d0 chain 128->64->64 @128',
                ((4, 128, 64), (4, 64, 64)), 128)


if __name__ == '__main__':
  main(sys.argv[1:])
