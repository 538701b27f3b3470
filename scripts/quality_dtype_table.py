#!/usr/bin/env python
"""Quality-vs-dtype table for the flagship composite (VERDICT r2 #2).

Runs synthetic phantoms through the varden-8x undersampling pipeline and
the flagship RecNet+refinement composite under each inference mode, and
reports PSNR/SSIM of the reconstruction magnitudes vs ground truth:

    f32        — reference semantics
    bf16       — default serving dtype
    bf16+fused — bf16 with the Pallas fused s2 chain (--fused parity check)
    int8       — opt-in quantized U-Net serving mode (OUTSIDE the 0.1 dB
                 default budget; ops/quantize.py)

    python scripts/quality_dtype_table.py [--sizes 256 512] [--batch 8]

Output: one markdown table on stdout (for NOTES.md).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(image_size, dtype_str, fused=False, quantized=False):
  import jax
  import jax.numpy as jnp
  from csmri_refinement_tpu.models.recnet import RecNet
  from csmri_refinement_tpu.models.unet import UNET
  from csmri_refinement_tpu.models.refinement_wrapper import (
      RefinementWrapper)

  dtype = jnp.bfloat16 if dtype_str == 'bf16' else None
  pretrained = RecNet(num_blocks=3, num_convs=3, num_filters=32, dtype=dtype)
  learnable = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
                   encode_filters=[32, 64, 128], decode_filters=[64, 32],
                   kernel_size=4, upsampling_mode='nn-resize-conv',
                   output_activation='none', padding='reflection',
                   decoder_act_upsampling_only=True, dtype=dtype,
                   fused_inference=fused, quantize_inference=quantized)
  return RefinementWrapper(pretrained_model=pretrained,
                           learnable_model=learnable,
                           mode='real-penalty-add', input_mode='output')


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--sizes', type=int, nargs='*', default=[256, 512])
  ap.add_argument('--batch', type=int, default=8)
  ap.add_argument('--checkpoint', default=None,
                  help='trained checkpoint; its model/generator weights '
                       'replace the random init (random init understates '
                       'int8 impact — the refinement term is small there)')
  ap.add_argument('--model-key', default='generator')
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from csmri_refinement_tpu.data.datasets import _make_phantoms
  from csmri_refinement_tpu.ops.ssim import ssim
  from csmri_refinement_tpu.ops import undersample as us_ops

  modes = [('f32', dict(dtype_str='f32')),
           ('bf16', dict(dtype_str='bf16')),
           ('bf16+fused', dict(dtype_str='bf16', fused=True)),
           ('int8', dict(dtype_str='bf16', quantized=True))]

  print('| size | mode | PSNR (dB) | dPSNR | SSIM | dSSIM |')
  print('|---|---|---|---|---|---|')
  for size in args.sizes:
    phantoms, _ = _make_phantoms(args.batch, size, seed=123)
    target = jnp.asarray(np.stack(phantoms), jnp.float32)
    batch = jax.jit(lambda k, t: us_ops.undersample_batch(
        k, t, 'varden', 8))(jax.random.PRNGKey(0), target)

    # identical f32 weights for every mode (bf16 casts at apply time)
    if args.checkpoint:
      from csmri_refinement_tpu.utils.checkpoints import (
          load_model_state_dict)
      variables = jax.device_put(
          load_model_state_dict(args.checkpoint, args.model_key))
    else:
      ref_model = build(size, 'f32')
      variables = jax.jit(lambda i, k, m: ref_model.init(
          jax.random.PRNGKey(2), i, k, m))(
              batch['inp'], batch['kspace'], batch['mask'])

    base_psnr = base_ssim = None
    for name, kw in modes:
      model = build(size, **kw)
      if kw.get('quantized'):
        from csmri_refinement_tpu.ops import quantize
        quantize.reset_trace_log()

      @jax.jit
      def predict(v, i, k, m):
        with jax.default_matmul_precision('high'):
          out = model.apply(v, i, k, m)
          pred = out['pred'].astype(jnp.float32)
          mag = jnp.clip(jnp.sqrt(pred[..., 0] ** 2 + pred[..., 1] ** 2),
                         0.0, 1.0)
          mse = jnp.mean((mag - target) ** 2)
          p = 10.0 * jnp.log10(1.0 / mse)
          s = ssim(mag[..., None], target[..., None])
          return p.astype(jnp.float32), s.astype(jnp.float32)

      p, s = predict(variables, batch['inp'], batch['kspace'], batch['mask'])
      p, s = float(p), float(s)
      if base_psnr is None:
        base_psnr, base_ssim = p, s
      label = name
      if kw.get('quantized'):
        from csmri_refinement_tpu.ops import quantize
        if quantize.fell_back_to_bf16():
          # A VMEM-budget trim rode the bf16 XLA path: this row is a
          # fallback-correctness record, not an int8 measurement.
          label = name + ' [bf16 VMEM-fallback]'
      print('| {} | {} | {:.4f} | {:+.4f} | {:.4f} | {:+.4f} |'.format(
          size, label, p, p - base_psnr, s, s - base_ssim), flush=True)


if __name__ == '__main__':
  main()
