#!/usr/bin/env python
"""Measure mixed-precision training (`train_dtype: bfloat16`) vs f32.

Throughput mode (default): steady-state samples/s of the standard
(configs/1 RecNet+MSE) and adversarial (configs/2 GAN) recipes on
synthetic data, per-step and steps_per_fetch=8 scan, for f32 and bf16
compute. Params/optimizer state stay f32 in both cases (see
training/runner.py `train_dtype`).

Quality mode (--quality): trains the configs/1 recipe for a few epochs in
f32 and bf16 on the same synthetic data/seed and reports val PSNR/SSIM for
both — the convergence evidence that bf16 compute does not derail the
recipe.

Usage: python scripts/probe_train_bf16.py [--image-size 256] [--steps 8]
       [--standard-batches 20 128] [--gan-batches 5 32] [--quality]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs')


def _load(name):
  with open(os.path.join(CONFIGS, name)) as f:
    return json.load(f)


def _synthetic(raw, image_size, batch_size, num_train=None, train_dtype=None):
  raw.update({
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': image_size,
                    'num_train': num_train or batch_size * 4,
                    'num_val': batch_size},
      'batch_size': batch_size, 'num_data_workers': 0,
  })
  if train_dtype:
    raw['train_dtype'] = train_dtype
  return raw


def build_standard(image_size, batch_size, train_dtype, num_train=None):
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils.config import Configuration
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  raw = _synthetic(_load('1-recnet.json'), image_size, batch_size,
                   num_train, train_dtype)
  conf = Configuration.from_dict(raw)
  runner = build_runner(conf, 'standard', mode='train')
  dataset = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      num_workers=0)
  return conf, runner, loader


def build_gan(image_size, batch_size, train_dtype):
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils.config import Configuration
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  raw = _load('2-refinement.json')
  del raw['generator_model']['pretrained_model']['pretrained_weights']
  raw = _synthetic(raw, image_size, batch_size, None, train_dtype)
  raw['vgg_random_init'] = True
  conf = Configuration.from_dict(raw)
  runner = build_runner(conf, 'adversarial', mode='train')
  dataset = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      num_workers=0)
  return runner, next(iter(loader))


def measure_standard(image_size, batch_size, steps, train_dtype):
  _, runner, loader = build_standard(image_size, batch_size, train_dtype)
  host_batch = next(iter(loader))

  def one_step():
    return runner._train_step(iter([host_batch]))

  for _ in range(2):
    one_step()
  start = time.perf_counter()
  for _ in range(steps):
    one_step()
  per_step = batch_size * steps / (time.perf_counter() - start)

  k = 8
  runner._run_scanned_updates([host_batch] * k)
  reps = max(steps // k, 2)
  start = time.perf_counter()
  for _ in range(reps):
    runner._run_scanned_updates([host_batch] * k)
  scanned = batch_size * k * reps / (time.perf_counter() - start)
  return per_step, scanned


def measure_gan(image_size, batch_size, steps, train_dtype):
  runner, host_batch = build_gan(image_size, batch_size, train_dtype)
  for _ in range(2):
    runner._run_one_update(host_batch, True, True)
  start = time.perf_counter()
  for _ in range(steps):
    runner._run_one_update(host_batch, True, True)
  per_step = batch_size * steps / (time.perf_counter() - start)

  k = 8
  runner._run_scanned_updates([host_batch] * k)
  reps = max(steps // k, 2)
  start = time.perf_counter()
  for _ in range(reps):
    runner._run_scanned_updates([host_batch] * k)
  scanned = batch_size * k * reps / (time.perf_counter() - start)
  return per_step, scanned


def quality_ab(image_size, epochs, num_train):
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  out = {}
  for train_dtype in (None, 'bfloat16'):
    conf, runner, loader = build_standard(image_size, 16, train_dtype,
                                          num_train=num_train)
    val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
    val_loader = DataLoader(val_set, 16)
    for epoch in range(1, epochs + 1):
      runner.train_epoch(loader, epoch, steps_per_train_summary=10 ** 9)
    _, _, val_metrics = runner.validate(val_loader)
    out[train_dtype or 'f32'] = {
        name: round(float(m.value), 4) for name, m in val_metrics.items()}
    print(json.dumps({'quality': train_dtype or 'f32', 'epochs': epochs,
                      **out[train_dtype or 'f32']}), flush=True)
  return out


def main(argv):
  parser = argparse.ArgumentParser()
  parser.add_argument('--image-size', type=int, default=256)
  parser.add_argument('--steps', type=int, default=8)
  parser.add_argument('--standard-batches', type=int, nargs='*',
                      default=[20, 128])
  parser.add_argument('--gan-batches', type=int, nargs='*', default=[5, 32])
  parser.add_argument('--dtypes', nargs='*', default=[None, 'bfloat16'])
  parser.add_argument('--quality', action='store_true')
  parser.add_argument('--quality-epochs', type=int, default=6)
  parser.add_argument('--quality-num-train', type=int, default=128)
  parser.add_argument('--platform', default=None,
                      help='pin jax platform (e.g. cpu) before any device '
                           'query — the shell env is clobbered by '
                           'sitecustomize (CLAUDE.md)')
  args = parser.parse_args(argv)

  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  if args.quality:
    quality_ab(args.image_size, args.quality_epochs, args.quality_num_train)
    return

  for dtype in args.dtypes:
    dtype = dtype if dtype not in (None, 'None', 'f32') else None
    for bs in args.standard_batches:
      try:
        per_step, scanned = measure_standard(args.image_size, bs,
                                             args.steps, dtype)
        print(json.dumps({
            'recipe': 'standard', 'train_dtype': dtype or 'f32',
            'batch': bs, 'per_step_sps': round(per_step, 2),
            'scanned8_sps': round(scanned, 2)}), flush=True)
      except Exception as e:
        print(json.dumps({'recipe': 'standard',
                          'train_dtype': dtype or 'f32', 'batch': bs,
                          'error': type(e).__name__,
                          'detail': str(e)[:200]}), flush=True)
    for bs in args.gan_batches:
      steps = args.steps if bs <= 8 else max(args.steps // 2, 2)
      try:
        per_step, scanned = measure_gan(args.image_size, bs, steps, dtype)
        print(json.dumps({
            'recipe': 'gan', 'train_dtype': dtype or 'f32', 'batch': bs,
            'per_step_sps': round(per_step, 2),
            'scanned8_sps': round(scanned, 2)}), flush=True)
      except Exception as e:
        print(json.dumps({'recipe': 'gan', 'train_dtype': dtype or 'f32',
                          'batch': bs, 'error': type(e).__name__,
                          'detail': str(e)[:200]}), flush=True)


if __name__ == '__main__':
  main(sys.argv[1:])
