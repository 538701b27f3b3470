#!/usr/bin/env python
"""Training CLI.

Rebuild of /root/reference/train.py:307-452 with the same surface: JSON
config + ``--conf key=value`` overrides, timestamped run dirs with a resolved
config snapshot, resume, TensorBoard scalar/image summaries, per-metric
best-checkpoint dirs with warmup, periodic checkpoints with pruning, early
stopping, subset samplers, and a ``--dry`` smoke mode.

Differences by design (TPU-first):

* no ``--cuda`` GPU picking — device placement is jit/sharding; multi-chip
  data parallelism is configured via the ``mesh`` config section
  (:mod:`csmri_refinement_tpu.parallel`)
* DataLoader is the threaded-prefetch host loader feeding GT slices; the
  forward model (mask gen + undersampling) runs on-device inside the step
"""

import argparse
import logging
import math
import os
import sys
import time
from itertools import chain

import numpy as np

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.training.early_stopping import EarlyStopper
from csmri_refinement_tpu.utils import set_random_seeds
from csmri_refinement_tpu.utils.checkpoints import (prune_checkpoints,
                                                    restore_checkpoint,
                                                    save_checkpoint)
from csmri_refinement_tpu.utils.checkpoint_paths import (
    get_best_checkpoint_path, get_config_path, get_periodic_checkpoint_path,
    get_run_dir)
from csmri_refinement_tpu.utils import preemption
from csmri_refinement_tpu.utils.config import Configuration
from csmri_refinement_tpu.utils.logging import setup_logging
from csmri_refinement_tpu.utils.diagnostics import print_model_parameters

DEFAULT_EPOCHS_PER_CHECKPOINT = 5
DEFAULT_EPOCHS_PER_VALIDATION = 5
DEFAULT_STEPS_PER_TRAIN_SUMMARY = 1
DEFAULT_NUM_WORKERS = 2
DEFAULT_NUM_PERIODIC_CHECKPOINTS = 1
DEFAULT_NUM_BEST_CHECKPOINTS = 3
DEFAULT_USE_TENSORBOARD = False
DEFAULT_NUM_IMAGE_SUMMARIES = 0
DEFAULT_INITIAL_VALIDATION = False
DEFAULT_BEST_VALUE_WARMUP_EPOCHS = 0

parser = argparse.ArgumentParser(description='Train model')
parser.add_argument('-v', '--verbose', action='store_true',
                    help='Print more info')
parser.add_argument('-p', '--print-model', action='store_true',
                    help='Print model informations')
parser.add_argument('--print-parameters', action='store_true',
                    help='Print parameter information')
parser.add_argument('--dry', action='store_true',
                    help='Do not create output directories')
parser.add_argument('--conf', nargs='+',
                    help='Optional config values to set (key=value)')
parser.add_argument('--data-dir', default='resources/data',
                    help='Path to data directory')
parser.add_argument('--log-dir', default='resources/models',
                    help='Path to log directory')
parser.add_argument('--run-dir', help='Path to specific output directory')
parser.add_argument('--resume',
                    help='Path to a checkpoint to resume training from')
parser.add_argument('--platform', default=None, choices=['cpu', 'tpu'],
                    help='Force a JAX platform (default: environment choice)')
parser.add_argument('--profile-dir', default=None,
                    help='Write a jax.profiler trace of training here')
parser.add_argument('config', help='Config file to use')


def set_platform(platform):
  if platform:
    import jax
    jax.config.update('jax_platforms', platform)


def _is_writer_process():
  """Checkpoint/summary writes happen on process 0 only — state is
  replicated, so one copy is the correct multi-host semantic."""
  import jax
  return jax.process_index() == 0


def save_periodic_checkpoint(conf, runner, epoch, best_val_metrics):
  if not _is_writer_process():
    return
  path = get_periodic_checkpoint_path(conf.run_dir, epoch)
  if not os.path.isdir(os.path.dirname(path)):
    logging.warning('Skip saving periodic checkpoint: %s does not exist',
                    os.path.dirname(path))
    return
  logging.info('Saving periodic checkpoint to %s', path)
  save_checkpoint(path, conf, runner, epoch, best_val_metrics)
  prune_checkpoints(os.path.dirname(path),
                    conf.get_attr('num_periodic_checkpoints',
                                  default=DEFAULT_NUM_PERIODIC_CHECKPOINTS))


def save_best_checkpoint(best_dir, best_val, conf, runner, epoch,
                         best_val_metrics):
  if not _is_writer_process():
    return
  path = get_best_checkpoint_path(best_dir, epoch, best_val)
  if not os.path.isdir(os.path.dirname(path)):
    logging.warning('Skip saving best value checkpoint: %s does not exist',
                    os.path.dirname(path))
    return
  logging.info('Saving best value checkpoint to %s', path)
  save_checkpoint(path, conf, runner, epoch, best_val_metrics)
  prune_checkpoints(os.path.dirname(path),
                    conf.get_attr('num_best_checkpoints',
                                  default=DEFAULT_NUM_BEST_CHECKPOINTS))


def make_comparison_grid(targets, predictions, num_images, pad=2):
  """Interleave target/prediction images into one CHW grid (numpy).

  NHWC single-channel inputs; two rows per pair block like the reference's
  torchvision make_grid usage (train.py:98-112).
  """
  images = []
  for idx, (target, prediction) in enumerate(zip(targets, predictions)):
    if idx >= num_images:
      break
    images += [np.asarray(target), np.asarray(prediction)]

  nrow = max(int(math.ceil(len(images) / 4)), 1)
  h, w = images[0].shape[0], images[0].shape[1]
  ncol = int(math.ceil(len(images) / nrow))
  grid = np.zeros((nrow * (h + pad) + pad, ncol * (w + pad) + pad, 1),
                  np.float32)
  for i, img in enumerate(images):
    r, c = divmod(i, ncol)
    y = pad + r * (h + pad)
    x = pad + c * (w + pad)
    grid[y:y + h, x:x + w] = img[..., :1]
  return np.transpose(grid, (2, 0, 1))  # CHW for tensorboardX


def save_images_to_tensorboard(summary_writer, conf, num_image_summaries,
                               global_step, tag, prediction, target):
  prediction = np.asarray(prediction)
  target = np.asarray(target)
  if prediction.shape != target.shape:
    logging.warning('Shape of prediction %s differs from target %s while '
                    'saving images', prediction.shape, target.shape)

  num_images = min(target.shape[0], num_image_summaries)
  if target.ndim != 4 or target.shape[-1] not in (1, 3):
    logging.debug('Skipping image summary with shape %s, tag %s',
                  target.shape, tag)
    return num_images

  if conf.get_attr('tensorboard_segmentation', default=False):
    num_classes = conf.get_attr('num_classes', default=None)
    if num_classes is None:
      num_classes = max(2, int(max(prediction.max(), target.max())) + 1)
    prediction = prediction.astype(np.float32) / (num_classes - 1)
    target = target.astype(np.float32) / (num_classes - 1)

  grid = make_comparison_grid(target, prediction, num_images)
  summary_writer.add_image(tag, grid, global_step)
  return num_images


def run_validation(conf, runner, epoch, val_loader, best_val_metrics,
                   chkpt_metric_dirs, summary_writer, num_batches_per_epoch,
                   early_stoppers=()):
  best_value_warmup = conf.get_attr('best_value_warmup_epochs',
                                    default=DEFAULT_BEST_VALUE_WARMUP_EPOCHS)
  num_image_summaries = conf.get_attr('num_image_summaries',
                                      default=DEFAULT_NUM_IMAGE_SUMMARIES)
  num_batches = int(np.ceil(num_image_summaries / val_loader.batch_size))

  val_start_time = time.time()
  data, val_losses, val_metrics = runner.validate(
      val_loader, num_batches_to_return=num_batches)
  val_duration = time.time() - val_start_time

  s = '===> Validation: '
  s += ', '.join('{}: {}'.format(name, loss)
                 for name, loss in val_losses.items())
  s += ', time: {:.4f}s\n'.format(val_duration)
  s += '\n'.join('     {}: {}'.format(name, metric)
                 for name, metric in val_metrics.items())
  logging.info(s)

  for name, value in chain(val_losses.items(), val_metrics.items()):
    if epoch <= best_value_warmup:
      continue

    best_value = False
    if name in best_val_metrics:
      if value > best_val_metrics[name]:
        best_val_metrics[name] = value
        best_value = True
    else:
      best_val_metrics[name] = value
      best_value = True

    if best_value and name in chkpt_metric_dirs:
      save_best_checkpoint(chkpt_metric_dirs[name], value.value, conf,
                           runner, epoch + 1, best_val_metrics)

    for early_stopper in early_stoppers:
      if name == early_stopper.name:
        if best_value:
          early_stopper.record_best_value(value, epoch)
        early_stopper.record_value(value, epoch)

  if summary_writer is not None:
    global_step = num_batches_per_epoch * epoch
    for metric_name, metric in chain(val_losses.items(),
                                     val_metrics.items()):
      summary_writer.add_scalar('validation/{}'.format(metric_name),
                                metric.value, global_step)

    if num_image_summaries > 0:
      remaining = num_image_summaries
      for idx, batch in enumerate(data):
        named_batch = runner.get_named_outputs(batch)
        if 'prediction' in named_batch:
          tag = 'validation/targets_and_predictions_{}'.format(idx)
          shown = save_images_to_tensorboard(
              summary_writer, conf, remaining, global_step, tag,
              named_batch['prediction'], named_batch['target'])
          remaining -= shown
        if remaining <= 0:
          break


def train_net(conf, runner, train_loader, val_loader, chkpt_metric_dirs=None,
              restore_state=None, summary_writer=None, early_stoppers=(),
              verbose=False):
  chkpt_metric_dirs = chkpt_metric_dirs or {}
  num_batches_per_epoch = len(train_loader)
  epochs_per_checkpoint = conf.get_attr(
      'epochs_per_checkpoint', default=DEFAULT_EPOCHS_PER_CHECKPOINT)
  epochs_per_validation = conf.get_attr(
      'epochs_per_validation', default=DEFAULT_EPOCHS_PER_VALIDATION)
  steps_per_summary = conf.get_attr(
      'steps_per_train_summary', default=DEFAULT_STEPS_PER_TRAIN_SUMMARY)
  initial_validation = conf.get_attr('initial_validation',
                                     default=DEFAULT_INITIAL_VALIDATION)

  if restore_state is None:
    start_epoch = 1
    best_val_metrics = {}
  else:
    assert 'start_epoch' in restore_state and \
        'best_val_metrics' in restore_state, \
        'Invalid checkpoint for resuming training. Inference checkpoint?'
    start_epoch = restore_state['start_epoch']
    best_val_metrics = restore_state['best_val_metrics']

  if restore_state is None and initial_validation:
    logging.info('Running pretraining validation')
    # NOTE: unlike the reference (train.py:264, which crashes here —
    # SURVEY.md §7 quirks), pass the early stoppers through.
    run_validation(conf, runner, 0, val_loader, best_val_metrics,
                   chkpt_metric_dirs, summary_writer, num_batches_per_epoch,
                   early_stoppers)
    save_periodic_checkpoint(conf, runner, 0, best_val_metrics)

  for epoch in range(start_epoch, conf.num_epochs + 1):
    runner.epoch_beginning(epoch)

    epoch_start_time = time.time()
    train_losses, train_metrics = runner.train_epoch(
        train_loader, epoch, summary_writer, steps_per_summary, verbose)
    epoch_duration = time.time() - epoch_start_time

    runner.epoch_finished(epoch)

    s = '===> Epoch {} Complete: '.format(epoch)
    s += ', '.join('{}: {}'.format(name, loss)
                   for name, loss in train_losses.items())
    s += ', time: {:.4f}s\n'.format(epoch_duration)
    s += '\n'.join('     {}: {}'.format(name, metric)
                   for name, metric in train_metrics.items())
    logging.info(s)

    if epoch % epochs_per_validation == 0:
      run_validation(conf, runner, epoch, val_loader, best_val_metrics,
                     chkpt_metric_dirs, summary_writer,
                     num_batches_per_epoch, early_stoppers)

    saved_this_epoch = (epoch % epochs_per_checkpoint == 0
                        or epoch == conf.num_epochs)
    if saved_this_epoch:
      save_periodic_checkpoint(conf, runner, epoch + 1, best_val_metrics)

    if preemption.requested():
      logging.info('Preemption: stopping after epoch %d (resume with '
                   '--resume to continue at epoch %d)', epoch, epoch + 1)
      if not saved_this_epoch:
        save_periodic_checkpoint(conf, runner, epoch + 1, best_val_metrics)
      return

    for early_stopper in early_stoppers:
      if early_stopper.should_stop(epoch):
        logging.info(early_stopper.stop_reason(epoch))
        return


def build_early_stoppers(conf):
  early_stoppers = []
  if conf.has_attr('early_stopping'):
    stopper_confs = [conf.early_stopping]
  elif conf.has_attr('early_stoppers'):
    stopper_confs = conf.early_stoppers
  else:
    stopper_confs = []
  for c in stopper_confs:
    early_stoppers.append(EarlyStopper(c['metric_name'], c['patience'],
                                       c.get('min_value'),
                                       c.get('max_difference')))
  return early_stoppers


def main(argv):
  args = parser.parse_args(argv)
  set_platform(args.platform)

  conf = Configuration.from_json(args.config)
  # Multi-host: no-op unless a coordinator is configured (see
  # parallel/distributed.py)
  from csmri_refinement_tpu.parallel.distributed import initialize
  initialize(conf)
  if args.conf:
    conf.update(dict(arg.split('=', 1) for arg in args.conf))

  # Run-dir setup
  if args.run_dir:
    conf.run_dir = args.run_dir
  elif args.resume and os.path.exists(args.resume):
    conf.run_dir = os.path.dirname(args.resume)
  if not conf.has_attr('run_dir'):
    run_name = conf.get_attr('run_name', default='unnamed_run')
    conf.run_dir = get_run_dir(args.log_dir, run_name)
  if not args.dry:
    os.makedirs(conf.run_dir, exist_ok=True)

  setup_logging(None if args.dry else conf.run_dir, 'train',
                verbose=args.verbose)
  logging.info('Commandline arguments: %s', ' '.join(argv))

  if not args.dry:
    logging.info('This run is saved to: %s', conf.run_dir)
    conf.serialize(get_config_path(conf.run_dir))

  if args.verbose:
    logging.debug(str(conf))

  set_random_seeds(conf.seed)

  logging.info('Setting up training runner %s', conf.runner_type)
  runner = build_runner(conf, conf.runner_type, mode='train')

  if args.print_model:
    print(str(runner))

  restore_state = None
  if args.resume:
    if os.path.exists(args.resume):
      restore_state = restore_checkpoint(args.resume, runner)
      logging.info('Restored checkpoint from %s', args.resume)
    else:
      logging.critical('Checkpoint %s to restore from not found',
                       args.resume)
      return

  use_tensorboard = conf.get_attr('use_tensorboard',
                                  default=DEFAULT_USE_TENSORBOARD)
  summary_writer = None
  if use_tensorboard and not args.dry and _is_writer_process():
    try:
      from tensorboardX import SummaryWriter
      summary_writer = SummaryWriter(conf.run_dir)
      logging.debug('Using tensorboardX summary writer')
    except ImportError:
      logging.warning('tensorboardX not available; disabling summaries')

  num_workers = conf.get_attr('num_data_workers',
                              default=DEFAULT_NUM_WORKERS)
  num_train_samples = conf.get_attr('num_train_subset_samples', default=None)
  num_val_samples = conf.get_attr('num_validation_subset_samples',
                                  default=None)

  # Multi-process run: batch_size stays GLOBAL; every process computes the
  # same index stream and materializes only its local slice per batch
  # (data/loader.py process_shard contract).
  import jax
  process_shard = None
  if jax.process_count() > 1:
    process_shard = (jax.process_index(), jax.process_count())

  train_dataset_name = conf.get_attr('train_dataset', alternative='dataset')
  logging.info('Loading training dataset %s', train_dataset_name)
  train_dataset = load_dataset(conf, args.data_dir, train_dataset_name,
                               'train')
  train_loader = DataLoader(train_dataset, conf.batch_size, shuffle=True,
                            seed=conf.seed, num_workers=num_workers,
                            num_samples=num_train_samples,
                            process_shard=process_shard)

  val_dataset_name = conf.get_attr('validation_dataset',
                                   alternative='dataset')
  logging.info('Loading validation dataset %s', val_dataset_name)
  val_dataset = load_dataset(conf, args.data_dir, val_dataset_name, 'val')
  val_loader = DataLoader(
      val_dataset,
      conf.get_attr('validation_batch_size', default=conf.batch_size),
      shuffle=False, num_workers=num_workers, num_samples=num_val_samples,
      process_shard=process_shard)

  # Per-metric best checkpoint dirs; config 2 uses best_checkpoint_metrics
  chkpt_metrics = conf.get_attr(
      'validation_checkpoint_metrics',
      default=conf.get_attr('best_checkpoint_metrics', default=[]))
  chkpt_metric_dirs = {metric: os.path.join(conf.run_dir, 'best_' + metric)
                       for metric in chkpt_metrics}
  if not args.dry:
    for metric_dir in chkpt_metric_dirs.values():
      os.makedirs(metric_dir, exist_ok=True)

  early_stoppers = build_early_stoppers(conf)

  if args.print_parameters:
    print_model_parameters(runner)

  # SIGTERM (preemption notice) → checkpoint at the epoch boundary → clean
  # exit; resume with --resume (utils/preemption.py)
  preemption.install()

  logging.info('Starting training run of %s epochs', conf.num_epochs)
  from csmri_refinement_tpu.utils.profiling import trace
  try:
    with trace(args.profile_dir):
      train_net(conf, runner, train_loader, val_loader, chkpt_metric_dirs,
                restore_state, summary_writer, early_stoppers, args.verbose)
  except KeyboardInterrupt:
    logging.info('Interrupted')
  finally:
    if summary_writer is not None:
      summary_writer.close()


if __name__ == '__main__':
  main(sys.argv[1:])
