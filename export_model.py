#!/usr/bin/env python
"""Export a checkpoint as a self-contained StableHLO serving artifact.

One step past deploy_checkpoint.py in the deployment funnel: deploy strips
a training checkpoint to inference weights (still needs this package's
model code to run); export freezes weights + forward graph into ONE file
(``jax.export``) that any compatible JAX runtime replays on cpu or tpu
without the model code. The reference has no equivalent (its deployment
ends at a stripped torch checkpoint, utils/deploy_checkpoint.py:23-33).

Example::

    python export_model.py conf.json deployed.ckpt model.shlo \\
        --batch-size 128 --verify
"""

import argparse
import logging
import os
import sys

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.utils import set_random_seeds
from csmri_refinement_tpu.utils.checkpoints import restore_checkpoint
from csmri_refinement_tpu.utils.config import Configuration
from csmri_refinement_tpu.utils.export import (export_predict, save_artifact,
                                               verify_artifact)
from csmri_refinement_tpu.utils.logging import setup_logging

parser = argparse.ArgumentParser(
    description='Export a checkpoint as a StableHLO serving artifact')
parser.add_argument('-v', '--verbose', action='store_true',
                    help='Print more info')
parser.add_argument('--data-dir', default='resources/data',
                    help='Path to data directory (shape source)')
parser.add_argument('-f', '--fold', choices=['train', 'val', 'test'],
                    default='val', help='Fold supplying the example batch')
parser.add_argument('-b', '--batch-size', type=int, default=1,
                    help='Serving batch size baked into the artifact '
                         '(static shapes; one artifact per serving point)')
parser.add_argument('--platforms', default='cpu,tpu',
                    help='Comma-separated lowering platforms (default '
                         'cpu,tpu: one artifact verifies on a CPU host and '
                         'serves on TPU)')
parser.add_argument('--platform', default=None, choices=['cpu', 'tpu'],
                    help='Force the JAX platform used to trace/verify')
parser.add_argument('--verify', action='store_true',
                    help='Replay the written artifact against '
                         'runner.predict and fail on mismatch > 1e-3')
parser.add_argument('--conf', nargs='+',
                    help='Optional config values to set')
parser.add_argument('config', help='Config file to use')
parser.add_argument('checkpoint',
                    help="Checkpoint to export ('NONE' for fresh init)")
parser.add_argument('output', help='Artifact file to write')


def main(argv):
  args = parser.parse_args(argv)
  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  setup_logging(None, 'export', verbose=args.verbose)
  logging.info('Commandline arguments: %s', ' '.join(argv))

  conf = Configuration.from_json(args.config)
  if args.conf:
    conf.update(dict(arg.split('=', 1) for arg in args.conf))
  set_random_seeds(conf.seed)

  runner = build_runner(conf, conf.runner_type, mode='test')
  if args.checkpoint != 'NONE':
    if not os.path.exists(args.checkpoint):
      logging.critical('Checkpoint %s to export not found', args.checkpoint)
      return 1
    restore_checkpoint(args.checkpoint, runner)
    logging.info('Restored checkpoint from %s', args.checkpoint)

  dataset = load_dataset(conf, args.data_dir, conf.validation_dataset,
                         args.fold)
  loader = DataLoader(dataset, batch_size=args.batch_size, num_workers=1,
                      shuffle=False)
  host_batch = next(iter(loader))

  platforms = tuple(p.strip() for p in args.platforms.split(',') if p.strip())
  exported, header = export_predict(runner, host_batch, platforms)
  save_artifact(args.output, exported, header, extra_meta={
      'config': os.path.basename(args.config),
      'checkpoint': os.path.basename(args.checkpoint),
      'runner_type': conf.runner_type,
  })
  size = os.path.getsize(args.output)
  print('Wrote serving artifact to {} ({:.1f} KiB, platforms {}, inputs '
        '{})'.format(args.output, size / 1024.0, list(exported.platforms),
                     header['input_shapes']))

  if args.verify:
    diff = verify_artifact(args.output, runner, host_batch)
    print('Verify: max |artifact - runner.predict| = {:.3g}'.format(diff))
    if not diff < 1e-3:
      logging.critical('Artifact verification FAILED (diff %g)', diff)
      return 1
  return 0


if __name__ == '__main__':
  sys.exit(main(sys.argv[1:]) or 0)
