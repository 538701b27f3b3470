#!/usr/bin/env python
"""Component-level timing on the real chip (scan-chain method).

Each timed quantity is a single compiled lax.scan whose iterations are
data-dependent, ended by a float32 scalar fetch — the only reliable timing
idiom on the tunneled backend (NOTES.md). Usage:

    python scripts/perf_probe.py [probe ...]   # default: all
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
SIZE = 256
ITERS = 8


def timed(fn, x, iters=ITERS, args=()):
  from csmri_refinement_tpu.utils.profiling import timed_scan
  return timed_scan(fn, x, iters=iters, args=args)


def report(name, secs, flops=None):
  line = '{:44s} {:8.2f} ms'.format(name, secs * 1e3)
  if flops:
    line += '  {:7.1f} TFLOPS'.format(flops / secs / 1e12)
  print(line, flush=True)


def conv_probes():
  from csmri_refinement_tpu.models.layers import same_conv, same_pad
  import flax.linen as nn

  for c, k in [(32, 4), (64, 4), (128, 4), (32, 3)]:
    size = SIZE if c == 32 else SIZE // (c // 32)
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, size, size, c), jnp.bfloat16))()
    conv = nn.Conv(c, (k, k), padding='VALID', dtype=jnp.bfloat16)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0),
                                same_pad(x[:1], k, 1, 'zero'))
    flops = 2 * BATCH * size * size * k * k * c * c

    def f_zero(x, conv=conv, params=params, k=k):
      return conv.apply(params, same_pad(x, k, 1, 'zero'))

    def f_reflect_naive(x, conv=conv, params=params, k=k):
      return conv.apply(params, same_pad(x, k, 1, 'reflection'))

    def f_reflect_fast(x, conv=conv, params=params, k=k):
      return same_conv(lambda p: conv.apply(params, p), x, k, 'reflection')

    tag = 'conv k{} C{} @{}'.format(k, c, size)
    report(tag + ' zero-pad', timed(f_zero, x), flops)
    report(tag + ' reflect-naive', timed(f_reflect_naive, x), flops)
    report(tag + ' reflect-fast', timed(f_reflect_fast, x), flops)


def dc_probe():
  from csmri_refinement_tpu.ops import dc as dc_ops
  # all array prep jitted (no-eager rule); big operands go through args=
  # (closure constants overflow the tunneled remote-compile endpoint)
  make = jax.jit(lambda b, s: jax.random.normal(
      jax.random.PRNGKey(1), (b, s, s, 2), jnp.float32),
      static_argnums=(0, 1))
  half = jax.jit(lambda v: 0.5 * v)
  for b, s in ((BATCH, SIZE), (32, 256), (32, 512)):
    xs = make(b, s)
    k0s = half(xs)
    ms = jnp.ones((b, s, s, 1), jnp.float32)
    report('DC fused B{} @{}'.format(b, s),
           timed(lambda v, k, m: dc_ops.data_consistency(v, k, m), xs,
                 args=(k0s, ms)))


def dc_skinny_probe():
  """Dense vs skinny (sampled-lines) DC at the flagship mask (varden 8x)."""
  from csmri_refinement_tpu.ops import dc as dc_ops
  from csmri_refinement_tpu.ops import undersample as us_ops

  @functools.partial(jax.jit, static_argnums=(0, 1))
  def make(b, s):
    key = jax.random.PRNGKey(1)
    gt = jax.random.uniform(key, (b, s, s))
    batch = us_ops.undersample_batch(key, gt, 'varden', 8)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, s, s, 2), jnp.float32)
    return x, batch['kspace'], batch['mask']

  for b, s in ((BATCH, 256), (BATCH, 512), (32, 512)):
    x, k0, m = make(b, s)
    klines = dc_ops.skinny_num_lines(s, 8)
    ctx = jax.jit(lambda k, mm: dc_ops.skinny_dc_context(k, mm, klines))(
        k0, m)
    report('DC dense B{} @{}'.format(b, s),
           timed(lambda v, k, mm: dc_ops.data_consistency(v, k, mm), x,
                 args=(k0, m)))
    report('DC skinny B{} @{} (K={})'.format(b, s, klines),
           timed(lambda v, g, x0: dc_ops._dc_skinny(v, (g, x0)),
                 x, args=ctx))
    report('DC skinny ctx-build B{} @{}'.format(b, s),
           timed(lambda k, mm: dc_ops.skinny_dc_context(k, mm, klines)[1],
                 k0, args=(m,)))


def model_probes(size=SIZE, batch=BATCH):
  from csmri_refinement_tpu.models.recnet import RecNet
  from csmri_refinement_tpu.models.unet import UNET
  from bench import build_forward

  dt = jnp.bfloat16
  recnet = RecNet(num_blocks=3, num_convs=3, num_filters=32, dtype=dt)
  inp = jax.jit(lambda: jax.random.normal(
      jax.random.PRNGKey(1), (batch, size, size, 2), dt))()
  ksp = jax.jit(lambda: jax.random.normal(
      jax.random.PRNGKey(2), (batch, size, size, 2), jnp.float32))()
  mask = jnp.ones((batch, size, size, 1), jnp.float32)
  rv = jax.jit(recnet.init)(jax.random.PRNGKey(0), inp, ksp, mask)
  report('RecNet 3x3x32 @{} B{}'.format(size, batch),
         timed(lambda x, k, m: recnet.apply(rv, x, k, m), inp,
               args=(ksp, mask)))

  unet = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
              encode_filters=[32, 64, 128], decode_filters=[64, 32],
              kernel_size=4, upsampling_mode='nn-resize-conv',
              output_activation='none', padding='reflection',
              decoder_act_upsampling_only=True, dtype=dt)
  uv = jax.jit(lambda x: unet.init(jax.random.PRNGKey(0), x))(inp)
  report('UNET flagship @{} B{}'.format(size, batch),
         timed(lambda x: jnp.pad(unet.apply(uv, x),
                                 [(0, 0)] * 3 + [(0, 1)]), inp))

  fwd, variables, batch_for = build_forward(size, 'bf16')
  b = batch_for(batch)
  report('flagship full @{} B{}'.format(size, batch),
         timed(lambda x, k, m: fwd(variables, x, k, m), b['inp'],
               args=(b['kspace'], b['mask'])))


def main(argv):
  probes = argv or ['conv', 'dc', 'model']
  print('backend:', jax.default_backend(), flush=True)
  if 'conv' in probes:
    conv_probes()
  if 'dc' in probes:
    dc_probe()
  if 'dcskinny' in probes:
    dc_skinny_probe()
  if 'model' in probes:
    model_probes()
  if 's2d' in probes:
    s2d_probes()
  if 'model512' in probes:
    # batch 128: throughput is ∝ min(batch, 128) on this chip (NOTES.md)
    model_probes(512, 128)



def s2d_probes():
  """Shapes the space-to-depth repacking would produce: C32@256 layers
  become C128@128 (k4->k3, k3->k2); C64@128 become C256@64 (k3)."""
  import flax.linen as nn
  shapes = [
      ('k2 C128 @128 (RecNet s2d)', 2, 128, 128, 128),
      ('k3 C128 @128 (UNet s0 s2d)', 3, 128, 128, 128),
      ('k3 C256 @64  (UNet s1 s2d)', 3, 256, 256, 64),
      ('k2 C128in->8out @128 (RecNet tail s2d)', 2, 128, 8, 128),
      ('k4 C32 @256', 4, 32, 32, 256),
  ]
  for name, k, cin, cout, size in shapes:
    batch = BATCH
    x = jax.jit(lambda cin=cin, size=size, batch=batch: jax.random.normal(
        jax.random.PRNGKey(1), (batch, size, size, cin), jnp.bfloat16))()
    conv = nn.Conv(cout, (k, k), padding='SAME', dtype=jnp.bfloat16)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0), x[:1])
    flops = 2 * batch * size * size * k * k * cin * cout

    def f(x, conv=conv, params=params, cin=cin):
      y = conv.apply(params, x)
      # keep carry shape: project back if cout != cin
      if y.shape[-1] != cin:
        y = jnp.concatenate([y] * (cin // y.shape[-1]), axis=-1)
      return y

    report(name, timed(f, x), flops)

if __name__ == '__main__':
  main(sys.argv[1:])
