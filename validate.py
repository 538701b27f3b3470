#!/usr/bin/env python
"""Validation / inference CLI.

Rebuild of /root/reference/validate.py:87-210: restores a checkpoint, runs
``runner.validate``/``runner.infer`` over datasets, prints averaged metrics,
writes PNG images (``-i``/``-d``) or raw ``.mat`` matrices (``--raw``, which
forces ``application='none'`` to suppress output transforms,
validate.py:118-127).
"""

import argparse
import logging
import os
import sys

import numpy as np

from csmri_refinement_tpu.data import DataLoader, is_dataset, load_dataset
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.utils import set_random_seeds
from csmri_refinement_tpu.utils.checkpoints import restore_checkpoint
from csmri_refinement_tpu.utils.checkpoint_paths import get_run_dir
from csmri_refinement_tpu.utils.config import Configuration
from csmri_refinement_tpu.utils.logging import setup_logging

DEFAULT_NUM_WORKERS = 1

parser = argparse.ArgumentParser(
    description='Validate model and infer predictions on images')
parser.add_argument('-v', '--verbose', action='store_true',
                    help='Print more info')
parser.add_argument('--dry', action='store_true',
                    help='Do not create output directories')
parser.add_argument('--data-dir', default='resources/data',
                    help='Path to data directory')
parser.add_argument('--out-dir', default='resources/outputs',
                    help='Path to where to save outputs')
parser.add_argument('-i', '--infer', action='store_true',
                    help='Save predicted images')
parser.add_argument('-d', '--dump', action='store_true',
                    help='Save input, target and predicted images')
parser.add_argument('--raw', action='store_true',
                    help='Save network outputs in matrix format')
parser.add_argument('-f', '--fold', choices=['train', 'val', 'test'],
                    default='val', help='Fold of dataset to use')
parser.add_argument('--conf', nargs='+',
                    help='Optional config values to set')
parser.add_argument('--platform', default=None, choices=['cpu', 'tpu'],
                    help='Force a JAX platform (default: environment choice)')
parser.add_argument('-b', '--batch-size', type=int, default=1,
                    help='Evaluation batch size (default 1 for parity with '
                         'the reference, whose stateful fixed masks forced '
                         'it; masks here are keyed per slice index, so any '
                         'batch size gives identical results — use e.g. '
                         '128 on TPU for throughput)')
parser.add_argument('config', help='Config file to use')
parser.add_argument('checkpoint', help='Checkpoint to use weights from')
parser.add_argument('files_or_dirs', nargs='*',
                    help='Datasets to evaluate')


def _save_image(image, path):
  from PIL import Image
  image = np.asarray(image)
  if image.ndim == 3 and image.shape[-1] == 2:
    image = np.sqrt(image[..., 0] ** 2 + image[..., 1] ** 2)
  image = np.squeeze(image)
  image = np.clip(image, 0.0, 1.0)
  Image.fromarray((image * 255).astype(np.uint8)).save(path)


def save_output_images(dataset, inputs, predictions, targets, output_dir,
                       filenames, task_name, dump, raw):
  for idx, name in enumerate(filenames):
    prefix = name if task_name == 'default' \
        else '{}_{}'.format(name, task_name)

    if raw:
      from csmri_refinement_tpu.data.io_mat import save_raw
      assert np.asarray(inputs).shape[0] == 1
      filepath = os.path.join(output_dir, '{}.mat'.format(prefix))
      save_raw(filepath, name, np.asarray(inputs),
               np.asarray(predictions), np.asarray(targets), dataset)
    else:
      if dump:
        _save_image(np.asarray(inputs)[idx],
                    os.path.join(output_dir, '{}_input.png'.format(prefix)))
        _save_image(np.asarray(targets)[idx],
                    os.path.join(output_dir, '{}_target.png'.format(prefix)))
      _save_image(np.asarray(predictions)[idx],
                  os.path.join(output_dir, '{}_pred.png'.format(prefix)))
      logging.debug('Wrote images for %s, task %s', name, task_name)


def main(argv):
  args = parser.parse_args(argv)
  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  setup_logging(None if args.dry else os.path.dirname(args.checkpoint),
                'eval', verbose=args.verbose)
  logging.info('Commandline arguments: %s', ' '.join(argv))

  conf = Configuration.from_json(args.config)
  if args.conf:
    conf.update(dict(arg.split('=', 1) for arg in args.conf))

  if args.verbose:
    logging.debug(str(conf))

  set_random_seeds(conf.seed)

  if args.raw:
    # Suppress output transforms when raw matrices are requested
    conf.application = 'none'

  runner = build_runner(conf, conf.runner_type, mode='test')

  if args.checkpoint != 'NONE':
    if os.path.exists(args.checkpoint):
      restore_checkpoint(args.checkpoint, runner)
      logging.info('Restored checkpoint from %s', args.checkpoint)
    else:
      logging.critical('Checkpoint %s to restore from not found',
                       args.checkpoint)
      return

  if len(args.files_or_dirs) == 0:
    datasets = [load_dataset(conf, args.data_dir, conf.validation_dataset,
                             args.fold)]
  else:
    datasets = [load_dataset(conf, args.data_dir, f, args.fold)
                for f in args.files_or_dirs if is_dataset(f)]

  mode = 'raw' if args.raw else 'dataset'
  num_samples = conf.get_attr('num_validation_subset_samples', default=None)

  for dataset in datasets:
    logging.info('Evaluating dataset %s', dataset.name)
    loader = DataLoader(dataset, batch_size=args.batch_size,
                        num_workers=DEFAULT_NUM_WORKERS, shuffle=False,
                        num_samples=num_samples)

    if mode == 'dataset':
      data, _, val_metrics = runner.validate(loader, len(loader))
      res_str = 'Average metrics for {}\n'.format(dataset.name)
      for metric_name, metric in val_metrics.items():
        res_str += '     {}: {}\n'.format(metric_name, metric)
      logging.info(res_str)
    else:
      data = runner.infer(loader)

    if not args.dry and (args.infer or args.dump or args.raw):
      conf_name = os.path.splitext(os.path.basename(conf.file or 'conf'))[0]
      output_dir = get_run_dir(args.out_dir,
                               '{}_{}'.format(dataset.name, conf_name))
      os.makedirs(output_dir, exist_ok=True)
      logging.info('Writing outputs to %s', output_dir)

      file_idx = 0
      for batch in data:
        named_batch = runner.get_named_outputs(batch)
        inp = named_batch['input']
        if 'prediction' in named_batch:
          batch_size = np.asarray(named_batch['prediction']).shape[0]
          filenames = [dataset.get_filename(idx)
                       for idx in range(file_idx, file_idx + batch_size)]
          save_output_images(dataset, inp, named_batch['prediction'],
                             named_batch['target'], output_dir, filenames,
                             'default', args.dump, args.raw)
          file_idx += len(filenames)

      logging.info('Finished writing outputs for dataset %s', dataset.name)


if __name__ == '__main__':
  main(sys.argv[1:])
