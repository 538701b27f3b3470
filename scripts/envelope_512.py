#!/usr/bin/env python
"""512² (paper-resolution) per-stage envelope table — VERDICT r4 #5.

256² got a full roofline story in rounds 2-4 (input-traffic-bound convs at
the conv emitter's ~2 TB/s effective rate; composed bench within ~6% of the
summed per-layer envelope). This script gives 512² the same treatment:

1. every flagship conv shape measured in ISOLATION at 512²/B128 (each is
   at its own envelope — the r2/r3 campaigns showed XLA's conv emitter is
   the achievable per-layer bound at C≤64, and Pallas only wins at C=128),
2. the skinny DC (K=64 sampled lines) + context build,
3. the analytic traffic/MXU model next to each measured row,
4. the sum vs the composed RecNet/UNET/full-model measurements — the
   composition gap IS the remaining headroom at this resolution.

Run on the real chip: python scripts/envelope_512.py  (~4 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 128
TRAFFIC_BYTES_PER_S = 2.0e12   # measured effective conv-emitter rate (r2)
MXU_TFLOPS = 150e12            # practical bf16 ceiling at C>=128 (r3)


def timed(fn, x, args=()):
  from csmri_refinement_tpu.utils.profiling import timed_scan
  return timed_scan(fn, x, iters=8, args=args)


def envelope_ms(h, w, cin, cout, k, dtype_bytes=2):
  traffic = B * h * w * cin * dtype_bytes * k * k / TRAFFIC_BYTES_PER_S
  mxu = 2.0 * B * h * w * cin * cout * k * k / MXU_TFLOPS
  return max(traffic, mxu) * 1e3, traffic * 1e3, mxu * 1e3


def conv_rows():
  from csmri_refinement_tpu.models.layers import same_conv, same_pad
  import flax.linen as nn

  # (stage, h, cin, cout, k, pad, count) — flagship inventory at 512².
  # RecNet: 3 blocks x (2->32, 32->32, 32->2) k3 zero-SAME
  # (models/recnet.py); UNET [32,64,128]/[64,32] k4 reflect
  # (configs/2-refinement.json) with subpixel nn-resize-conv decode ups
  # (low-res source conv to 4*Cout channels + depth-to-space, unet.py).
  inventory = [
      ('recnet conv 2->32', 512, 2, 32, 3, 'zero', 3),
      ('recnet conv 32->32', 512, 32, 32, 3, 'zero', 3),
      ('recnet conv 32->2', 512, 32, 2, 3, 'zero', 3),
      ('unet s0 conv 2->32', 512, 2, 32, 4, 'reflection', 1),
      ('unet s0 conv 32->32', 512, 32, 32, 4, 'reflection', 1),
      ('unet s1 conv 32->64', 256, 32, 64, 4, 'reflection', 1),
      ('unet s1 conv 64->64', 256, 64, 64, 4, 'reflection', 1),
      ('unet s2 conv 64->128', 128, 64, 128, 4, 'reflection', 1),
      ('unet s2 conv 128->128', 128, 128, 128, 4, 'reflection', 1),
      ('unet d0 up 128->4*64 (subpixel)', 128, 128, 256, 4, 'reflection', 1),
      ('unet d0 merge 128->64', 256, 128, 64, 4, 'reflection', 1),
      ('unet d0 conv 64->64', 256, 64, 64, 4, 'reflection', 1),
      ('unet d1 up 64->4*32 (subpixel)', 256, 64, 128, 4, 'reflection', 1),
      ('unet d1 merge 64->32', 512, 64, 32, 4, 'reflection', 1),
      ('unet d1 conv 32->32', 512, 32, 32, 4, 'reflection', 1),
      ('unet head 32->1', 512, 32, 1, 4, 'reflection', 1),
  ]

  total_meas, total_env = 0.0, 0.0
  print('{:34s} {:>9s} {:>9s} {:>9s} {:>9s} x'.format(
      'stage', 'meas ms', 'env ms', 'traffic', 'mxu'))
  for name, h, cin, cout, k, pad, count in inventory:
    x = jax.jit(lambda h=h, cin=cin: jax.random.normal(
        jax.random.PRNGKey(1), (B, h, h, cin), jnp.bfloat16))()
    conv = nn.Conv(cout, (k, k), padding='VALID', dtype=jnp.bfloat16)
    params = jax.jit(conv.init)(jax.random.PRNGKey(0),
                                same_pad(x[:1], k, 1, 'zero'))
    def fit(x, y, cin=cin):
      # timed_scan carries the input shape: adapt the output's channel
      # count keeping data dependence — slice (r2/r3 conv-table idiom,
      # perf_conv_kernel.probe_mixed) when the output is wide enough; a
      # numerically-inert broadcast-add for narrow outputs (the x32
      # concat the tile idiom would need for the 32->1 head crashes the
      # relay compiler at 512²/B128)
      co = y.shape[-1]
      if co >= cin:
        return y[..., :cin]
      if 2 * co >= cin:  # merge convs: one duplicate, the r2/r3 idiom
        return jnp.concatenate([y, y], axis=-1)[..., :cin]
      return x + 1e-30 * y[..., :1]

    if pad == 'zero':
      fn = lambda x, conv=conv, params=params, k=k: fit(x, conv.apply(
          params, same_pad(x, k, 1, 'zero')))
    else:
      fn = lambda x, conv=conv, params=params, k=k: fit(x, same_conv(
          lambda p: conv.apply(params, p), x, k, 'reflection'))
    meas = timed(fn, x) * 1e3
    env, traffic, mxu = envelope_ms(h, h, cin, cout, k)
    total_meas += meas * count
    total_env += env * count
    print('{:34s} {:9.2f} {:9.2f} {:9.2f} {:9.2f} x{}'.format(
        name, meas, env, traffic, mxu, count))
  return total_meas, total_env


def dc_rows():
  from csmri_refinement_tpu.ops import dc as dc_ops
  from csmri_refinement_tpu.ops import masks as mask_ops

  s = 512
  x = jax.jit(lambda: jax.random.normal(
      jax.random.PRNGKey(1), (B, s, s, 2), jnp.float32))()
  ksp = jax.jit(lambda: jax.random.normal(
      jax.random.PRNGKey(2), (B, s, s, 2), jnp.float32))()
  key = jax.random.PRNGKey(3)
  mask = jax.jit(lambda k: mask_ops.make_masks(
      k, B, s, s, sampling_scheme='varden', acceleration_factor=8))(key)
  mask = mask[..., None].astype(jnp.float32)

  n_lines = mask_ops.cartesian_num_lines(s, 8.0)
  g_cat, x0 = jax.jit(lambda k, m, x: dc_ops.skinny_dc_context(
      k, m, n_lines, x0=x))(ksp, mask, x)

  def dc_skinny(x, k, m, g, x0):
    return dc_ops.data_consistency(x, k, m, skinny_ctx=(g, x0))

  meas = timed(dc_skinny, x, args=(ksp, mask, g_cat, x0)) * 1e3
  # envelope: the packed-2K lowering is two GEMMs of (B) x (2K, H) x
  # (H, W) each way = 2 * 2*B*(2K)*H*W MACs total, at bf16x3 ~140 TFLOPS
  flops = 2 * (2.0 * B * (2 * n_lines) * s * s) * 2
  env = flops / (140e12 / 3) * 1e3  # pinned 'high' = 3 bf16 passes
  print('{:34s} {:9.2f} {:9.2f} {:>9s} {:9.2f} x3'.format(
      'dc skinny K={} (packed)'.format(n_lines), meas, env, '-', env))

  # Context build (top_k + DFT-row gathers; x0 is the model input = free).
  # ctx depends only on (k, m) — loop-invariant inside the timing scan, so
  # XLA would hoist it. Tie it to the carry with a numerically-inert
  # 1e-30*x perturbation of k, and subtract that add's own cost.
  def perturb_only(x, k, m):
    return x + 1e-30 * k

  def ctx_and_dc(x, k, m):
    kp = k + 1e-30 * x
    ctx = dc_ops.skinny_dc_context(kp, m, n_lines, x0=x)
    return dc_ops.data_consistency(x, kp, m, skinny_ctx=ctx)

  add_ms = timed(perturb_only, x, args=(ksp, mask)) * 1e3
  ctxdc_ms = timed(ctx_and_dc, x, args=(ksp, mask)) * 1e3
  ctx_ms = max(ctxdc_ms - add_ms - meas, 0.0)
  print('{:34s} {:9.2f}   (ctx+dc {:.2f} - add {:.2f} - dc {:.2f})'.format(
      'dc skinny ctx build (shared)', ctx_ms, ctxdc_ms, add_ms, meas))
  return meas * 3 + ctx_ms, env * 3


def main():
  print('backend:', jax.default_backend(), flush=True)
  conv_meas, conv_env = conv_rows()
  dc_meas, dc_env = dc_rows()

  print('\nsum of isolated stages: measured {:.1f} ms, envelope {:.1f} ms'
        .format(conv_meas + dc_meas, conv_env + dc_env))

  # Composed measurements for the gap statement
  from scripts.perf_probe import model_probes
  model_probes(512, B)
  print('\n(512^2 B128 slices/s = 128000 / composed-full-ms)')


if __name__ == '__main__':
  main()
