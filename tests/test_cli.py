"""End-to-end CLI tests: train → resume → validate → deploy, via main()."""

import glob
import json
import os

import numpy as np
import pytest


@pytest.fixture
def tiny_config(tmp_path):
  conf = {
      'seed': 0,
      'run_name': 'tiny',
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 8, 'num_val': 4},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'standard',
      'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 1, 'num_convs': 2,
                'num_filters': 4},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'num_epochs': 2,
      'batch_size': 4,
      'epochs_per_validation': 1,
      'epochs_per_checkpoint': 1,
      'validation_metrics': ['psnr'],
      'validation_checkpoint_metrics': ['psnr'],
  }
  path = str(tmp_path / 'tiny.json')
  with open(path, 'w') as f:
    json.dump(conf, f)
  return path


def test_train_validate_deploy_cycle(tiny_config, tmp_path, capsys):
  import train as train_cli
  import validate as validate_cli
  import deploy_checkpoint as deploy_cli

  log_dir = str(tmp_path / 'runs')
  train_cli.main([tiny_config, '--log-dir', log_dir])

  run_dirs = glob.glob(os.path.join(log_dir, 'tiny_*'))
  assert len(run_dirs) == 1
  run_dir = run_dirs[0]

  ckpts = glob.glob(os.path.join(run_dir, 'periodic-chkpt_*.ckpt'))
  assert ckpts, 'no periodic checkpoint written'
  best = glob.glob(os.path.join(run_dir, 'best_psnr', 'best-chkpt_*.ckpt'))
  assert best, 'no best checkpoint written'
  configs = glob.glob(os.path.join(run_dir, 'config_*.json'))
  assert configs, 'no resolved config snapshot'

  # Resume for one more epoch
  with open(tiny_config) as f:
    conf = json.load(f)
  conf['num_epochs'] = 3
  with open(tiny_config, 'w') as f:
    json.dump(conf, f)
  train_cli.main([tiny_config, '--log-dir', log_dir,
                  '--resume', sorted(ckpts)[-1]])

  # Validate from the best checkpoint
  validate_cli.main([tiny_config, best[0], '--dry'])
  out = capsys.readouterr().out

  # Deploy: strip optimizer state
  deployed = str(tmp_path / 'deploy.ckpt')
  deploy_cli.main(['standard', best[0], deployed])
  from csmri_refinement_tpu.utils.checkpoints import load_checkpoint
  ckpt = load_checkpoint(deployed)
  assert set(ckpt['runner'].keys()) == {'model'}
  assert 'optimizer' not in ckpt['runner']

  # Validate from the deployed inference checkpoint
  validate_cli.main([tiny_config, deployed, '--dry'])


def test_validate_raw_outputs(tiny_config, tmp_path):
  import train as train_cli
  import validate as validate_cli
  from csmri_refinement_tpu.data.io_mat import load_from_raw

  log_dir = str(tmp_path / 'runs')
  train_cli.main([tiny_config, '--log-dir', log_dir])
  ckpt = sorted(glob.glob(os.path.join(
      log_dir, 'tiny_*', 'periodic-chkpt_*.ckpt')))[-1]

  out_dir = str(tmp_path / 'outputs')
  validate_cli.main([tiny_config, ckpt, '--raw', '--infer',
                     '--out-dir', out_dir])
  mats = glob.glob(os.path.join(out_dir, '*', '*.mat'))
  assert len(mats) == 4  # one per val slice
  record = load_from_raw(mats[0])
  assert record['pred'].shape == (32, 32, 2)  # raw complex, no transform


def test_adversarial_train_validate_cycle(tmp_path):
  import json
  import train as train_cli
  import validate as validate_cli
  from tests.test_adversarial import _conf

  conf = _conf().to_dict()
  conf['run_name'] = 'gan-tiny'
  conf['num_epochs'] = 1
  conf['epochs_per_validation'] = 1
  conf['epochs_per_checkpoint'] = 1
  conf.pop('_seed', None)
  conf['seed'] = 1
  conf.pop('_src_file', None)
  path = str(tmp_path / 'gan.json')
  with open(path, 'w') as f:
    json.dump(conf, f)

  log_dir = str(tmp_path / 'runs')
  train_cli.main([path, '--log-dir', log_dir])
  ckpts = glob.glob(os.path.join(log_dir, 'gan-tiny_*',
                                 'periodic-chkpt_*.ckpt'))
  assert ckpts

  # test-mode validate builds generator only and restores from the GAN ckpt
  validate_cli.main([path, ckpts[0], '--dry'])

  # deploy strips to generator
  import deploy_checkpoint as deploy_cli
  deployed = str(tmp_path / 'gen.ckpt')
  deploy_cli.main(['adversarial', ckpts[0], deployed])
  from csmri_refinement_tpu.utils.checkpoints import load_checkpoint
  assert set(load_checkpoint(deployed)['runner'].keys()) == {'generator'}
  validate_cli.main([path, deployed, '--dry'])
