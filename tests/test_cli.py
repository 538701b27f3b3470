"""End-to-end CLI tests: train → resume → validate → deploy, via main()."""

import glob
import json
import os

import numpy as np
import pytest


# Heavyweight end-to-end/architecture tests: deselect with -m "not slow"
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


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


def test_flagship_refinement_config_end_to_end(tmp_path):
  """The shipped paper flagship config (configs/2-refinement.json) trains
  end-to-end via train.py with only dataset/size overrides, and
  deploy_checkpoint.py strips the result to generator-only."""
  import train as train_cli
  import deploy_checkpoint as deploy_cli
  import validate as validate_cli

  repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  # 128² is the smallest size the paper's 6-layer stride-2 discriminator
  # geometry supports (reflect-pad needs ≥4² at the final conv).
  synth = ('synthetic={"image_size": 128, "num_train": 5, "num_val": 5}')

  # 1. Pretrain the RecNet the flagship recipe wraps (paper step 1).
  recnet_conf = {
      'seed': 0, 'run_name': 'recnet-pre',
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 5, 'num_val': 5},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 8,
                        'variable_acceleration': False},
      'runner_type': 'standard', 'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 3, 'num_convs': 3,
                'num_filters': 32},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.0002},
      'num_epochs': 1, 'batch_size': 5, 'epochs_per_validation': 5,
      'epochs_per_checkpoint': 1,
  }
  pre_path = str(tmp_path / 'recnet-pre.json')
  with open(pre_path, 'w') as f:
    json.dump(recnet_conf, f)
  log_dir = str(tmp_path / 'runs')
  train_cli.main([pre_path, '--log-dir', log_dir])
  recnet_ckpt = sorted(glob.glob(os.path.join(
      log_dir, 'recnet-pre_*', 'periodic-chkpt_*.ckpt')))[-1]

  # 2. Shipped flagship config, patched only where the reference's own
  # placeholder demands it (INSERT_CHECKPOINT_PATH_HERE → real checkpoint).
  with open(os.path.join(repo_root, 'configs', '2-refinement.json')) as f:
    conf = json.load(f)
  conf['generator_model']['pretrained_model']['pretrained_weights'] = [
      recnet_ckpt, 'model']
  flagship_path = str(tmp_path / '2-refinement.json')
  with open(flagship_path, 'w') as f:
    json.dump(conf, f)

  train_cli.main([
      flagship_path, '--log-dir', log_dir, '--conf',
      'train_dataset=Synthetic', 'validation_dataset=Synthetic', synth,
      'num_epochs=1', 'num_data_workers=0', 'use_tensorboard=False',
      'num_image_summaries=0', 'steps_per_train_summary=100',
      'vgg_random_init=True'])

  run_dir = glob.glob(os.path.join(log_dir, '2-refinement_*'))[0]
  ckpts = glob.glob(os.path.join(run_dir, 'periodic-chkpt_*.ckpt'))
  assert ckpts, 'flagship run wrote no checkpoint'
  assert glob.glob(os.path.join(run_dir, 'best_gen_psnr', '*.ckpt')), \
      'best_checkpoint_metrics: [gen_psnr] produced no best checkpoint'

  # 3. Deploy to a generator-only inference checkpoint and validate with it.
  deployed = str(tmp_path / 'deployed.ckpt')
  deploy_cli.main(['adversarial', ckpts[0], deployed])
  from csmri_refinement_tpu.utils.checkpoints import load_checkpoint
  ckpt = load_checkpoint(deployed)
  assert set(ckpt['runner'].keys()) == {'generator'}

  validate_cli.main([
      flagship_path, deployed, '--dry', '--conf',
      'train_dataset=Synthetic', 'validation_dataset=Synthetic', synth])


def test_bench_watchdog_stdout_contract(tmp_path):
  """bench.py (VERDICT r3 #1): the watchdog parent must put EXACTLY one
  JSON line on stdout — a measurement here; a structured error record when
  the child is killed at the budget."""
  import subprocess
  import sys
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

  out = subprocess.run(
      [sys.executable, 'bench.py', '--platform', 'cpu', '--batch-size', '2',
       '--image-size', '32', '--iters', '2', '--warmup', '1',
       '--extra-sizes', '48', '--latency'],
      capture_output=True, text=True, cwd=repo, timeout=240)
  lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
  assert len(lines) == 1, out.stdout
  rec = json.loads(lines[0])
  assert rec['unit'] == 'slices/s'
  assert rec['value'] > 0 and 'vs_baseline' in rec

  # Driver-record safety (VERDICT r4 #2): the driver merges stdout+stderr
  # and takes the last JSON-looking line as the official record. With
  # extras + latency rows enabled, the MERGED stream must still contain
  # exactly ONE bare JSON line — the headline; every stderr row rides a
  # non-JSON 'extra: ' prefix (bench._extra_row).
  merged = (out.stdout + '\n' + out.stderr).strip().splitlines()
  json_lines = []
  for line in merged:
    try:
      json_lines.append(json.loads(line))
    except ValueError:
      pass
  assert len(json_lines) == 1, merged
  assert json_lines[0] == rec
  # ...and the extras did actually run (prefixed, grep-able)
  assert any(l.startswith('extra: ') for l in out.stderr.splitlines()), \
      out.stderr

  # Budget expiry: still exactly one line, now a structured error record
  # whose stage distinguishes outage from code failure.
  out = subprocess.run(
      [sys.executable, 'bench.py', '--platform', 'cpu', '--budget', '2'],
      capture_output=True, text=True, cwd=repo, timeout=120)
  lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
  assert len(lines) == 1, out.stdout
  rec = json.loads(lines[0])
  assert rec['error'] == 'budget_exceeded'
  assert 'stage' in rec and 'metric' in rec
