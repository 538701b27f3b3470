"""End-to-end standard-runner tests: RecNet training on synthetic data.

The JAX analogue of BASELINE.json config 1 (RecNet + MSE, CPU-runnable).
"""

import jax
import numpy as np
import pytest

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.utils.config import Configuration


def _conf(**overrides):
  base = {
      'seed': 0,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 8, 'num_val': 4},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'standard',
      'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 2, 'num_convs': 2,
                'num_filters': 8},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'batch_size': 4,
      'train_metrics': ['psnr'],
      'validation_metrics': ['psnr', 'ssim'],
  }
  base.update(overrides)
  return Configuration.from_dict(base)


@pytest.fixture(scope='module')
def trained():
  conf = _conf()
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=0)
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  val_loader = DataLoader(val_set, 2)

  # Validation masks are deterministic, so val metrics isolate model quality
  # from mask randomness (train loss is noisy across random masks).
  _, _, val_before = runner.validate(val_loader)
  for epoch in range(1, 6):
    losses, metrics = runner.train_epoch(loader, epoch,
                                         steps_per_train_summary=100)
  _, _, val_after = runner.validate(val_loader)
  return conf, runner, val_before, losses, metrics, val_after


def test_training_improves_val_psnr(trained):
  _, _, val_before, _, _, val_after = trained
  assert val_after['psnr'].value > val_before['psnr'].value


def test_train_metrics_present(trained):
  _, _, _, _, metrics, _ = trained
  assert 'psnr' in metrics
  assert np.isfinite(metrics['psnr'].value)


def test_validation(trained):
  conf, runner = trained[0], trained[1]
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  epoch_data, val_losses, val_metrics = runner.validate(loader, 1)
  assert 'loss_MSE' in val_losses
  assert 'psnr' in val_metrics and 'ssim' in val_metrics
  assert -1.0 <= val_metrics['ssim'].value <= 1.0
  assert len(epoch_data) == 1
  named = runner.get_named_outputs(epoch_data[0])
  assert named['prediction'].shape == (2, 32, 32, 1)  # magnitude transform


def test_validation_masks_are_fixed(trained):
  """Same slice gets the same mask on every validation pass."""
  conf, runner = trained[0], trained[1]
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  batch = next(iter(loader))
  prep1 = runner.preparer.prepare_val(batch)
  prep2 = runner.preparer.prepare_val(batch)
  np.testing.assert_array_equal(np.asarray(prep1['mask']),
                                np.asarray(prep2['mask']))
  # ...and differs across slices
  assert not np.array_equal(np.asarray(prep1['mask'][0]),
                            np.asarray(prep1['mask'][1]))


def test_checkpoint_roundtrip(tmp_path, trained):
  conf, runner = trained[0], trained[1]
  from csmri_refinement_tpu.utils import checkpoints

  path = str(tmp_path / 'chk.ckpt')
  checkpoints.save_checkpoint(path, conf, runner, epoch=5,
                              best_val_metrics={'psnr': 30.0})

  runner2 = build_runner(_conf(), 'standard', 'train')
  state = checkpoints.restore_checkpoint(path, runner2)
  assert state['start_epoch'] == 5
  assert state['best_val_metrics']['psnr'].value == 30.0

  # Predictions agree after restore
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  batch = next(iter(loader))
  prep = runner.preparer.prepare_val(batch)
  out1 = np.asarray(runner.predict(prep))
  out2 = np.asarray(runner2.predict(prep))
  np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_inference_mode_runner(trained):
  conf, runner = trained[0], trained[1]
  runner_test = build_runner(conf, 'standard', 'test')
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  data = runner_test.infer(loader)
  assert len(data) == 2  # 4 val images / batch 2


def test_lr_scheduler_applies():
  conf = _conf(optimizer={'name': 'Adam', 'learning_rate': 0.001,
                          'lr_scheduler': 'multistep',
                          'decay_steps': [1], 'decay_factor': 0.1})
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4)
  runner.train_epoch(loader, 1)
  runner.epoch_beginning(2)
  from csmri_refinement_tpu.training.optimizers import get_learning_rate
  assert abs(get_learning_rate(runner.state['opt_state']) - 0.0001) < 1e-9


def test_resume_first_epoch_uses_scheduled_lr(tmp_path):
  """Regression: epoch_beginning fires before lazy state init on --resume;
  the scheduled (decayed) LR must still apply to the first resumed epoch."""
  from csmri_refinement_tpu.training.optimizers import get_learning_rate
  from csmri_refinement_tpu.utils import checkpoints

  sched_opt = {'name': 'Adam', 'learning_rate': 0.001,
               'lr_scheduler': 'multistep', 'decay_steps': [2],
               'decay_factor': 0.1}
  conf = _conf(optimizer=sched_opt)
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4)
  runner.epoch_beginning(1)
  runner.train_epoch(loader, 1)
  path = str(tmp_path / 'resume.ckpt')
  checkpoints.save_checkpoint(path, conf, runner, epoch=1,
                              best_val_metrics={})

  # Fresh runner (fresh process equivalent): restore, resume at epoch 5.
  runner2 = build_runner(_conf(optimizer=sched_opt), 'standard', 'train')
  checkpoints.restore_checkpoint(path, runner2)
  assert runner2.state is None  # state is still lazy at epoch_beginning time
  runner2.epoch_beginning(5)
  runner2.train_epoch(loader, 5)
  # epoch 5 → scheduler(4), past decay step 2 → 0.001 * 0.1
  assert abs(get_learning_rate(runner2.state['opt_state']) - 1e-4) < 1e-9


def test_validation_metrics_batch_size_invariant():
  """Evaluation batch size does not change validation metrics: fixed val
  masks are keyed per slice index (not per batch), unlike the reference's
  stateful mask rotation which forced batch_size=1 (validate.py:18 there).
  Backs validate.py's --batch-size option."""
  conf = _conf()
  runner = build_runner(conf, 'standard', 'train')
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')

  _, _, m1 = runner.validate(DataLoader(val_set, 1, shuffle=False))
  _, _, m4 = runner.validate(DataLoader(val_set, 4, shuffle=False))
  assert set(m1) == set(m4)
  for name in m1:
    np.testing.assert_allclose(m1[name].value, m4[name].value, rtol=1e-4)


def test_steps_per_fetch_scan_matches_per_step_trajectory():
  """Standard-runner steps_per_fetch throughput mode: lax.scan of k
  updates per host fetch must reproduce the per-step trajectory EXACTLY
  (same key stream, same math) — only the loss-fetch cadence changes.
  Mirrors the adversarial-runner equivalence test."""
  conf_a = _conf()
  runner_a = build_runner(conf_a, 'standard', 'train')
  train_set = load_dataset(conf_a, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  runner_a.train_epoch(loader, 1, steps_per_train_summary=100)

  conf_b = _conf(steps_per_fetch=2)
  runner_b = build_runner(conf_b, 'standard', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  losses_b, _ = runner_b.train_epoch(loader, 1, steps_per_train_summary=100)

  # 8 samples / batch 4 = 2 steps, scanned in one fetch
  assert int(runner_b.state['step']) == 2
  assert all(np.isfinite(m.value) for m in losses_b.values())

  # identical key stream and math; only XLA fusion order differs (the
  # per-step path runs prepare_train eagerly, the scan traces it into one
  # program). Both trajectories are bit-deterministic within a process;
  # their gap is reassociation noise Adam-amplified to ~5e-6 on near-zero
  # weights (measured). atol 2e-5 stays 50x below the 1e-3-lr Adam step
  # any semantic divergence (wrong key stream / batch order) would show as.
  for a, b in zip(jax.tree_util.tree_leaves(runner_a.state['params']),
                  jax.tree_util.tree_leaves(runner_b.state['params'])):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_steps_per_fetch_partial_final_chunk():
  """A final fetch smaller than steps_per_fetch (epoch length not a
  multiple of k) still trains on every batch exactly once."""
  conf = _conf(steps_per_fetch=3)  # 2 steps/epoch -> one chunk of 2
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  assert int(runner.state['step']) == 2
  assert all(np.isfinite(m.value) for m in losses.values())


def test_steps_per_fetch_ragged_final_batch():
  """drop_last=False loaders yield a short final batch; the scan chunker
  must hold it back for its own (shorter) scan instead of crashing
  np.stack — every sample trains exactly once."""
  conf = _conf(steps_per_fetch=8,
               synthetic={'image_size': 32, 'num_train': 10, 'num_val': 4})
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)  # batches 4, 4, 2
  losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  assert int(runner.state['step']) == 3
  assert runner._pending_host_batch is None
  assert all(np.isfinite(m.value) for m in losses.values())
  assert 'loss' in losses and any(n.startswith('loss_') for n in losses)


def test_train_remat_matches_plain_trajectory():
  """train_remat (jax.checkpoint'd forward) is an HBM knob, not a math
  change: the rematerialized step must reproduce the plain trajectory to
  float-noise tolerance (only XLA's schedule differs)."""
  runner_a = build_runner(_conf(), 'standard', 'train')
  train_set = load_dataset(_conf(), '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  runner_a.train_epoch(loader, 1, steps_per_train_summary=100)

  runner_b = build_runner(_conf(train_remat=True), 'standard', 'train')
  assert runner_b.train_remat
  loader = DataLoader(train_set, 4, shuffle=False)
  losses_b, _ = runner_b.train_epoch(loader, 1, steps_per_train_summary=100)
  assert all(np.isfinite(m.value) for m in losses_b.values())

  for a, b in zip(jax.tree_util.tree_leaves(runner_a.state['params']),
                  jax.tree_util.tree_leaves(runner_b.state['params'])):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-5)
