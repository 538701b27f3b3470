#!/usr/bin/env python
"""Sweep the TRAIN-side scoped-VMEM compiler option (VERDICT r3 #3).

The serving path ships a measured 40/64 MiB scoped-VMEM default
(utils/compile_opts.py); the training step only has the opt-in
CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB, never measured. This sweeps it over the
flagship GAN D-then-G update (configs/2 recipe, synthetic data) in the
same two modes bench.py --train records: per-step host fetch and the
steps_per_fetch=8 lax.scan.

The env var is read at step-jit creation, so each option builds a fresh
runner (fresh closures -> fresh jit cache entries).

Usage: python scripts/probe_train_vmem.py [--image-size 256]
       [--batches 5 32] [--steps 8] [--options 0 24576 40960 65536 98304]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner_and_batch(image_size, batch_size):
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
  })
  conf = Configuration.from_dict(raw)
  runner = build_runner(conf, 'adversarial', mode='train')
  dataset = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      num_workers=0)
  return runner, next(iter(loader))


def measure(image_size, batch_size, steps):
  """Returns (per_step_sps, scanned_sps) for the current env setting."""
  runner, host_batch = build_runner_and_batch(image_size, batch_size)

  for _ in range(2):  # compile + warm
    runner._run_one_update(host_batch, True, True)
  start = time.perf_counter()
  for _ in range(steps):
    runner._run_one_update(host_batch, True, True)
  per_step = batch_size * steps / (time.perf_counter() - start)

  k = 8
  batches = [host_batch] * k
  runner._run_scanned_updates(batches)  # compile
  reps = max(steps // k, 2)
  start = time.perf_counter()
  for _ in range(reps):
    runner._run_scanned_updates(batches)
  scanned = batch_size * k * reps / (time.perf_counter() - start)
  return per_step, scanned


def paired_ab(image_size, batch_size, steps, kib, reps):
  """Interleaved-window A/B: backend-default vs KIB train scoped-VMEM.

  Both runners are built once (each reads the env var at step-jit
  creation), then timed B C B C ... within one process so relay drift
  cancels pairwise (NOTES round 5: within-epoch floor is ±0.3%, so a
  >=1% paired median is real)."""
  os.environ.pop('CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB', None)
  base_runner, base_batch = build_runner_and_batch(image_size, batch_size)
  os.environ['CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB'] = str(kib)
  cand_runner, cand_batch = build_runner_and_batch(image_size, batch_size)
  os.environ.pop('CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB', None)

  def window(runner, host_batch):
    for _ in range(2):  # compile (first window) + warm
      runner._run_one_update(host_batch, True, True)
    start = time.perf_counter()
    for _ in range(steps):
      runner._run_one_update(host_batch, True, True)
    return batch_size * steps / (time.perf_counter() - start)

  window(base_runner, base_batch)  # compile both before pairing
  window(cand_runner, cand_batch)
  pairs = []
  for _ in range(reps):
    b = window(base_runner, base_batch)
    c = window(cand_runner, cand_batch)
    pairs.append((round(b, 2), round(c, 2)))
  deltas = sorted(c / b - 1.0 for b, c in pairs)
  print(json.dumps({
      'mode': 'paired_ab', 'train_scoped_vmem_kib': kib,
      'batch': batch_size, 'paired_windows': pairs,
      'median_delta_pct': round(100 * deltas[len(deltas) // 2], 2),
      'mean_delta_pct': round(100 * sum(deltas) / len(deltas), 2),
  }), flush=True)


def main(argv):
  parser = argparse.ArgumentParser()
  parser.add_argument('--image-size', type=int, default=256)
  parser.add_argument('--batches', type=int, nargs='*', default=[5, 32])
  parser.add_argument('--steps', type=int, default=8)
  parser.add_argument('--options', type=int, nargs='*',
                      default=[0, 24576, 40960, 65536, 98304],
                      help='scoped-VMEM KiB values; 0 = backend default')
  parser.add_argument('--ab', type=int, default=None, metavar='KIB',
                      help='paired A/B mode: build the baseline (backend '
                           'default) and the KIB-candidate runner ONCE, '
                           'then time them in interleaved windows — the '
                           'only protocol for small effects (NOTES round '
                           '5 variance model)')
  parser.add_argument('--reps', type=int, default=4,
                      help='interleaved window pairs in --ab')
  args = parser.parse_args(argv)

  if args.ab:
    paired_ab(args.image_size, args.batches[0], args.steps, args.ab,
              args.reps)
    return

  for kib in args.options:
    if kib:
      os.environ['CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB'] = str(kib)
    else:
      os.environ.pop('CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB', None)
    for bs in args.batches:
      steps = args.steps if bs <= 8 else max(args.steps // 2, 2)
      try:
        per_step, scanned = measure(args.image_size, bs, steps)
        print(json.dumps({
            'train_scoped_vmem_kib': kib, 'batch': bs,
            'per_step_sps': round(per_step, 2),
            'scanned8_sps': round(scanned, 2)}), flush=True)
      except Exception as e:
        print(json.dumps({
            'train_scoped_vmem_kib': kib, 'batch': bs,
            'error': type(e).__name__, 'detail': str(e)[:200]}), flush=True)


if __name__ == '__main__':
  main(sys.argv[1:])
