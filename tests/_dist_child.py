"""Child process for tests/test_distributed.py.

Runs a tiny synthetic training (standard or adversarial runner) on a global
data-parallel mesh, either single-process (world=1: the ordinary 8-virtual-
device CPU mesh) or as one rank of a multi-process CPU cluster (world>1:
4 local devices per process, gloo collectives, production
``parallel.distributed.initialize`` path from the config's ``distributed``
section). Prints one ``DISTRESULT {json}`` line with the per-epoch loss
trajectory and validation metrics so the parent can assert the
multi-process run reproduces the single-process one.

The reference has no multi-process support at all (SURVEY.md §2.8); this is
the TPU-native upgrade path (multi-host DCN) exercised on CPU hardware.
"""

import json
import os
import sys


def _standard_conf(cfg):
  conf = {
      'seed': 3,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 16, 'num_val': 8},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'standard',
      'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 2, 'num_convs': 2,
                'num_filters': 8},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'batch_size': 8,
      'validation_metrics': ['psnr'],
      'mesh': {'data': -1},
  }
  return conf


def _adversarial_conf(cfg):
  return {
      'seed': 4,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 16, 'num_val': 8},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'adversarial',
      'vgg_random_init': True,
      'application': 'reconstruction',
      'generator_model': {
          'name': 'RefinementWrapper',
          'mode': 'real-penalty-add',
          'input_mode': 'output',
          'pretrained_model': {'name': 'RecNet', 'num_blocks': 1,
                               'num_convs': 2, 'num_filters': 4},
          'learnable_model': {
              'name': 'UNET', 'num_inputs': 2, 'num_outputs': 1,
              'num_layers_per_scale': 1, 'encode_filters': [4, 8],
              'decode_filters': [4], 'kernel_size': 4,
              'upsampling_mode': 'nn-resize-conv',
              'output_activation': 'none', 'padding': 'reflection',
              'decoder_act_upsampling_only': True},
      },
      'discriminator_model': {
          'num_inputs': 1, 'input_method': 'simple-magnitude',
          'num_filters_per_layer': [8, 16], 'strides': [2, 2],
          'kernel_sizes': 4, 'final_conv_kernel_size': 4,
          'padding': 'reflection', 'use_norm_layers': 'not-first',
          'norm_layer': 'batch', 'compute_features': True,
          'use_image_pool': True, 'image_pool_size': 16,
      },
      'generator_adversarial_losses': ['gan', 'FeatureMatching'],
      'generator_losses': ['VGG19', 'FeaturePenalty'],
      'generator_loss_weights': {'gan': 0.5, 'VGG19': 10,
                                 'FeaturePenalty': 2},
      'discriminator_losses': ['gan'],
      'discriminator_label_smoothing': 0.1,
      'feature_penalty': {'criterion': 'L1',
                          'input_key': 'prescaled_refinement'},
      'generator_optimizer': {'name': 'Adam', 'learning_rate': 2e-4,
                              'beta1': 0.5},
      'discriminator_optimizer': {'name': 'Adam', 'learning_rate': 2e-4,
                                  'beta1': 0.5},
      'batch_size': 8,
      'validation_metrics': ['psnr'],
      'mesh': {'data': -1},
  }


def main():
  cfg = json.loads(sys.argv[1])
  sys.path.insert(0, cfg['repo'])

  import jax
  jax.config.update('jax_platforms', 'cpu')

  from csmri_refinement_tpu.utils.config import Configuration
  conf_dict = (_standard_conf(cfg) if cfg['runner'] == 'standard'
               else _adversarial_conf(cfg))
  if cfg.get('steps_per_fetch'):
    conf_dict['steps_per_fetch'] = cfg['steps_per_fetch']
  if cfg.get('spatial'):
    # 2-D data x spatial mesh; with world=2 the spatial shards stay inside
    # each process (grid rows are contiguous device ids)
    conf_dict['mesh'] = {'data': -1, 'spatial': cfg['spatial']}
  if cfg['world'] > 1:
    conf_dict['distributed'] = {
        'coordinator_address': '127.0.0.1:{}'.format(cfg['port']),
        'num_processes': cfg['world'],
        'process_id': cfg['rank'],
    }
  conf = Configuration.from_dict(conf_dict)

  # Production multi-host entry: selects gloo CPU collectives and calls
  # jax.distributed.initialize from the config's `distributed` section.
  from csmri_refinement_tpu.parallel.distributed import initialize
  initialize(conf)
  assert jax.process_count() == cfg['world']
  assert jax.device_count() == 8, jax.devices()

  from csmri_refinement_tpu.data import DataLoader, load_dataset
  from csmri_refinement_tpu.training import build_runner

  runner = build_runner(conf, conf_dict['runner_type'], 'train')
  shard = ((jax.process_index(), jax.process_count())
           if cfg['world'] > 1 else None)
  train_ds = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_ds, conf.batch_size, shuffle=True,
                      seed=conf.seed, process_shard=shard)

  result = {'train': []}
  for epoch in range(1, cfg['epochs'] + 1):
    runner.epoch_beginning(epoch)
    losses, _ = runner.train_epoch(loader, epoch,
                                   steps_per_train_summary=10 ** 6)
    runner.epoch_finished(epoch)
    result['train'].append(
        {name: float(m.value) for name, m in losses.items()})

  val_ds = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  val_loader = DataLoader(val_ds, conf.batch_size, process_shard=shard)
  _, val_losses, val_metrics = runner.validate(val_loader)
  result['val'] = {name: float(m.value)
                   for name, m in {**val_losses, **val_metrics}.items()}

  print('DISTRESULT ' + json.dumps(result))
  sys.stdout.flush()


if __name__ == '__main__':
  main()
