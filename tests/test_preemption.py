"""Preemption handling: SIGTERM → epoch-boundary checkpoint → clean exit
(utils/preemption.py; wired in train.py's epoch loop).
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pytest

from csmri_refinement_tpu.utils import preemption

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _restore_signal_state():
  previous = {sig: signal.getsignal(sig) for sig in preemption.SIGNALS}
  preemption.reset()
  yield
  preemption.reset()
  for sig, handler in previous.items():
    signal.signal(sig, handler)


def _tiny_conf(num_epochs):
  return {
      'seed': 0,
      'run_name': 'preempt',
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
      'num_epochs': num_epochs,
      'batch_size': 4,
      'epochs_per_validation': 1000,   # never, so only preemption saves
      'epochs_per_checkpoint': 1000,
  }


def test_flag_roundtrip():
  assert not preemption.requested()
  preemption.request(signal.SIGTERM)
  assert preemption.requested()
  preemption.reset()
  assert not preemption.requested()


def test_install_replaces_and_reports_previous_handler():
  previous = preemption.install()
  assert signal.getsignal(signal.SIGTERM) is preemption.request
  assert set(previous) == set(preemption.SIGNALS)
  os.kill(os.getpid(), signal.SIGTERM)
  assert preemption.requested()


@pytest.mark.slow
@pytest.mark.e2e
def test_preset_flag_stops_after_first_epoch_and_saves(tmp_path):
  """With the flag already set, train_net runs exactly one epoch, saves a
  resume checkpoint for epoch 2, and returns; --resume continues from it."""
  import train as train_cli

  conf_path = str(tmp_path / 'conf.json')
  with open(conf_path, 'w') as f:
    json.dump(_tiny_conf(num_epochs=50), f)
  log_dir = str(tmp_path / 'runs')

  preemption.request()
  train_cli.main([conf_path, '--log-dir', log_dir])

  ckpts = glob.glob(os.path.join(log_dir, 'preempt_*',
                                 'periodic-chkpt_*.ckpt'))
  assert len(ckpts) == 1, ckpts
  # Path format: periodic-chkpt_{time}_{epoch}.ckpt — saved FOR epoch 2
  assert ckpts[0].rsplit('_', 1)[1] == '2.ckpt', ckpts[0]

  # The checkpoint resumes cleanly (one more preempted epoch: 2 → save 3)
  preemption.reset()
  preemption.request()
  train_cli.main([conf_path, '--log-dir', log_dir, '--resume', ckpts[0]])
  ckpts = sorted(glob.glob(os.path.join(log_dir, 'preempt_*',
                                        'periodic-chkpt_*.ckpt')))
  assert any(c.rsplit('_', 1)[1] == '3.ckpt' for c in ckpts), ckpts


@pytest.mark.slow
@pytest.mark.e2e
def test_sigterm_subprocess_checkpoints_and_exits_cleanly(tmp_path):
  """A real SIGTERM mid-run: the trainer finishes the current epoch,
  writes a checkpoint, and exits 0."""
  conf_path = str(tmp_path / 'conf.json')
  with open(conf_path, 'w') as f:
    json.dump(_tiny_conf(num_epochs=10000), f)
  log_dir = str(tmp_path / 'runs')

  env = dict(os.environ, JAX_PLATFORMS='cpu')
  proc = subprocess.Popen(
      [sys.executable, 'train.py', conf_path, '--log-dir', log_dir,
       '--platform', 'cpu'],
      cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
      text=True)
  try:
    # Wait until at least one epoch completed (compile + first steps)
    deadline = time.time() + 300
    log_glob = os.path.join(log_dir, 'preempt_*', 'log_train*.txt')
    while time.time() < deadline:
      logs = glob.glob(log_glob)
      if logs and 'Epoch 1 Complete' in open(logs[0]).read():
        break
      time.sleep(0.5)
    else:
      pytest.fail('trainer never completed an epoch')

    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
  finally:
    if proc.poll() is None:
      proc.kill()
      proc.communicate()

  assert proc.returncode == 0, out[-3000:]
  ckpts = glob.glob(os.path.join(log_dir, 'preempt_*',
                                 'periodic-chkpt_*.ckpt'))
  assert ckpts, out[-3000:]
  logs = open(glob.glob(log_glob)[0]).read()
  assert 'Preemption requested' in logs
  assert 'Preemption: stopping after epoch' in logs
