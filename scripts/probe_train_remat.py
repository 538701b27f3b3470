#!/usr/bin/env python
"""Measure train_remat (jax.checkpoint'd GAN forwards) on the real chip.

The plain 5-network GAN step RESOURCE_EXHAUSTs HBM at batch 64 @256²
(NOTES.md round 3) — batch 32 was the throughput-mode ceiling. train_remat
recomputes the gen/disc/VGG activations in the backward instead of storing
them, trading ~1 extra forward of FLOPs for that HBM. This probes whether
the bigger batch buys more than the recompute costs.

Grid: {remat off, on} × {batch 32, 64} × {per-step, scanned8}, flagship
recipe (configs/2, synthetic 256²). OOM rows are recorded as structured
errors, not crashes.

Usage: python scripts/probe_train_remat.py [--image-size 256]
       [--batches 32 64] [--steps 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner_and_batch(image_size, batch_size, train_remat):
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils.config import Configuration
  from csmri_refinement_tpu.data import DataLoader, load_dataset

  with open(os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'configs', '2-refinement.json')) as f:
    raw = json.load(f)
  del raw['generator_model']['pretrained_model']['pretrained_weights']
  raw.update({
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': image_size, 'num_train': batch_size * 4,
                    'num_val': batch_size},
      'batch_size': batch_size, 'num_data_workers': 0,
      'vgg_random_init': True,
      'train_remat': train_remat,
  })
  conf = Configuration.from_dict(raw)
  runner = build_runner(conf, 'adversarial', mode='train')
  dataset = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      num_workers=0)
  return runner, next(iter(loader))


def measure(image_size, batch_size, steps, train_remat, scanned_too=True):
  """Returns (per_step_sps, scanned_sps or None)."""
  runner, host_batch = build_runner_and_batch(image_size, batch_size,
                                              train_remat)

  for _ in range(2):  # compile + warm
    runner._run_one_update(host_batch, True, True)
  start = time.perf_counter()
  for _ in range(steps):
    runner._run_one_update(host_batch, True, True)
  per_step = batch_size * steps / (time.perf_counter() - start)

  scanned = None
  if scanned_too:
    k = 8
    batches = [host_batch] * k
    runner._run_scanned_updates(batches)  # compile
    reps = max(steps // k, 2)
    start = time.perf_counter()
    for _ in range(reps):
      runner._run_scanned_updates(batches)
    scanned = batch_size * k * reps / (time.perf_counter() - start)
  return per_step, scanned


def main(argv):
  parser = argparse.ArgumentParser()
  parser.add_argument('--image-size', type=int, default=256)
  parser.add_argument('--batches', type=int, nargs='*', default=[32, 64])
  parser.add_argument('--steps', type=int, default=8)
  parser.add_argument('--no-scan', action='store_true',
                      help='skip the (noisy) scanned8 measurement')
  parser.add_argument('--remat', choices=['off', 'on', 'both'],
                      default='both',
                      help='run one remat setting only — REQUIRED for '
                           'honest OOM rows: grid cells in one process '
                           'inherit the previous cells\' live executables '
                           '+ buffers, so a later cell can OOM on '
                           'leftovers rather than its own working set '
                           '(measured: remat/B32 OOMs third-in-process '
                           'but fits alone). Run one cell per process.')
  args = parser.parse_args(argv)

  remat_values = {'off': (False,), 'on': (True,),
                  'both': (False, True)}[args.remat]
  for train_remat in remat_values:
    for bs in args.batches:
      steps = args.steps if bs <= 8 else max(args.steps // 2, 2)
      try:
        per_step, scanned = measure(args.image_size, bs, steps, train_remat,
                                    scanned_too=not args.no_scan)
        print(json.dumps({
            'train_remat': train_remat, 'batch': bs,
            'per_step_sps': round(per_step, 2),
            'scanned8_sps': None if scanned is None else round(scanned, 2),
        }), flush=True)
      except Exception as e:
        print(json.dumps({
            'train_remat': train_remat, 'batch': bs,
            'error': type(e).__name__, 'detail': str(e)[:200]}), flush=True)


if __name__ == '__main__':
  main(sys.argv[1:])
