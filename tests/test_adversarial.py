"""Adversarial runner end-to-end tests: tiny refinement GAN on synthetic
data (the scaled-down configs/2-refinement.json recipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.training import build_runner, image_pool
from csmri_refinement_tpu.utils.config import Configuration


# Heavyweight end-to-end/architecture tests: deselect with -m "not slow"
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


def _conf(**overrides):
  base = {
      'seed': 1,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 8, 'num_val': 4},
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
              'decoder_act_upsampling_only': True,
              'weight_init': {'conv_weight': ['orthogonal', 'relu'],
                              'batchnorm_weight': ['constant', 1.0]}},
      },
      'discriminator_model': {
          'num_inputs': 1,
          'input_method': 'simple-magnitude',
          'num_filters_per_layer': [8, 16, 16],
          'strides': [2, 2, 1],
          'kernel_sizes': 4,
          'final_conv_kernel_size': 4,
          'padding': 'reflection',
          'act_fn': 'lrelu',
          'relu_leakiness': 0.2,
          'dropout_after': [2],
          'dropout_prob': 0.5,
          'use_norm_layers': 'not-first',
          'norm_layer': 'batch',
          'compute_features': True,
          'use_image_pool': True,
          'image_pool_size': 8,
      },
      'generator_adversarial_losses': ['gan', 'FeatureMatching'],
      'generator_losses': ['VGG19', 'FeaturePenalty'],
      'generator_loss_weights': {'gan': 0.5, 'VGG19': 10,
                                 'FeaturePenalty': 2},
      'discriminator_losses': ['gan'],
      'discriminator_label_smoothing': 0.1,
      'feature_penalty': {'criterion': 'L1',
                          'input_key': 'prescaled_refinement'},
      'generator_optimizer': {'name': 'Adam', 'learning_rate': 0.0002,
                              'beta1': 0.5},
      'discriminator_optimizer': {'name': 'Adam', 'learning_rate': 0.0002,
                                  'beta1': 0.5},
      'batch_size': 4,
      'train_generator_metrics': ['psnr'],
      'train_discriminator_metrics': ['binary_accuracy'],
      'validation_metrics': ['psnr', 'ssim'],
  }
  base.update(overrides)
  return Configuration.from_dict(base)


@pytest.fixture(scope='module')
def gan_trained():
  conf = _conf()
  runner = build_runner(conf, 'adversarial', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=1)
  losses, metrics = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  return conf, runner, losses, metrics


def test_gan_losses_present(gan_trained):
  _, _, losses, _ = gan_trained
  for name in ('disc_loss_gan', 'disc_loss', 'gen_loss_gan',
               'gen_loss_FeatureMatching', 'gen_loss_VGG19',
               'gen_loss_FeaturePenalty', 'gen_loss'):
    assert name in losses, name
    assert np.isfinite(losses[name].value), name


def test_gan_metrics_present(gan_trained):
  _, _, _, metrics = gan_trained
  assert 'gen_psnr' in metrics
  assert 'disc_binary_accuracy' in metrics
  assert 0.0 <= metrics['disc_binary_accuracy'].value <= 1.0


def test_gan_updates_both_nets(gan_trained):
  conf, runner, _, _ = gan_trained
  assert int(runner.gen_state['step']) >= 2
  assert int(runner.disc_state['step']) >= 2
  # Frozen pretrained RecNet inside the wrapper must not have moved from
  # its grafted/init values: check Adam mu for that subtree is all zero
  mu = runner.gen_state['opt_state'].inner_state[0].mu
  pretrained_mu = jax.tree_util.tree_leaves(mu['pretrained_model'])
  assert all(float(jnp.abs(m).max()) == 0.0 for m in pretrained_mu)


def test_gan_pool_fills(gan_trained):
  _, runner, _, _ = gan_trained
  assert runner.pool_state is not None
  assert int(runner.pool_state['count']) == 8  # 2 steps × batch 4


def test_gan_validation(gan_trained):
  conf, runner, _, _ = gan_trained
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  data, val_losses, val_metrics = runner.validate(loader, 1)
  assert 'gen_loss_VGG19' in val_losses
  assert 'gen_psnr' in val_metrics and 'gen_ssim' in val_metrics
  named = runner.get_named_outputs(data[0])
  assert named['prediction'].shape == (2, 32, 32, 1)
  assert named['disc_fake'] is not None


def test_gan_checkpoint_roundtrip(tmp_path, gan_trained):
  conf, runner, _, _ = gan_trained
  from csmri_refinement_tpu.utils import checkpoints
  path = str(tmp_path / 'gan.ckpt')
  checkpoints.save_checkpoint(path, conf, runner, 3, {})

  runner2 = build_runner(_conf(), 'adversarial', 'train')
  state = checkpoints.restore_checkpoint(path, runner2)
  assert state['start_epoch'] == 3

  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  batch = next(iter(DataLoader(val_set, 2)))
  prep = runner.preparer.prepare_val(batch)
  out1 = runner.predict(prep)
  out2 = runner2.predict(prep)
  np.testing.assert_allclose(np.asarray(out1['pred']),
                             np.asarray(out2['pred']), atol=1e-6)


def test_gan_test_mode_runner(gan_trained):
  conf, _, _, _ = gan_trained
  runner = build_runner(conf, 'adversarial', 'test')
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  data = runner.infer(loader)
  assert len(data) == 2
  named = runner.get_named_outputs(data[0])
  assert named['disc_fake'] is None  # no discriminator in test mode


def test_pretraining_schedules():
  conf = _conf(pretrain_generator_epochs=2)
  runner = build_runner(conf, 'adversarial', 'train')
  runner.epoch_beginning(1)
  assert runner.generator_enabled and not runner.discriminator_enabled
  runner.epoch_beginning(3)
  assert runner.generator_enabled and runner.discriminator_enabled

  conf = _conf(pretrain_discriminator_epochs=[1, 3])
  runner = build_runner(conf, 'adversarial', 'train')
  runner.epoch_beginning(2)
  assert runner.discriminator_enabled and not runner.generator_enabled


def test_gen_pretraining_trains_without_disc():
  conf = _conf(pretrain_generator_epochs=1)
  runner = build_runner(conf, 'adversarial', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4)
  runner.epoch_beginning(1)
  losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  assert 'gen_loss_VGG19' in losses
  assert 'disc_loss' not in losses
  assert 'gen_loss_gan' not in losses
  assert int(runner.disc_state['step']) == 0


def test_multi_updates_per_step():
  conf = _conf()
  conf.discriminator_optimizer['updates_per_step'] = 2
  runner = build_runner(conf, 'adversarial', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4)
  losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  # 8 samples / batch 4 = 2 batches per multi-step → 1 step: D twice, G once
  assert int(runner.disc_state['step']) == 2
  assert int(runner.gen_state['step']) == 1


def test_pretrained_recnet_grafting(tmp_path):
  """RefinementWrapper loads its frozen RecNet from a standard checkpoint
  (the configs/2-refinement.json pretrained_weights mechanism)."""
  from csmri_refinement_tpu.utils import checkpoints
  from tests.test_runner import _conf as std_conf

  std_runner = build_runner(std_conf(
      model={'name': 'RecNet', 'num_blocks': 1, 'num_convs': 2,
             'num_filters': 4}), 'standard', 'train')
  train_set = load_dataset(std_conf(), '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4)
  std_runner.train_epoch(loader, 1)
  ckpt_path = str(tmp_path / 'recnet.ckpt')
  checkpoints.save_checkpoint(ckpt_path, std_conf(), std_runner, 1, {})

  conf = _conf()
  conf.generator_model['pretrained_model']['pretrained_weights'] = \
      [ckpt_path, 'model']
  runner = build_runner(conf, 'adversarial', 'train')
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  batch = next(iter(DataLoader(val_set, 2)))
  prep = runner.preparer.prepare_val(batch)
  runner._ensure_initialized(prep)

  got = runner.gen_state['params']['pretrained_model']
  want = std_runner.state['params']
  for g, w in zip(jax.tree_util.tree_leaves(got),
                  jax.tree_util.tree_leaves(want)):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w))


# -- image pool unit tests -----------------------------------------------------


def test_image_pool_fill_phase():
  state = image_pool.init_pool(4, (2, 2, 1))
  batch = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1)
  new_state, out = image_pool.query(state, batch, jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(out), np.asarray(batch))
  assert int(new_state['count']) == 2
  np.testing.assert_allclose(np.asarray(new_state['images'][:2]),
                             np.asarray(batch))


def test_image_pool_swap_phase():
  state = image_pool.init_pool(2, (1, 1, 1))
  fill = jnp.asarray([[[[1.0]]], [[[2.0]]]])
  state, _ = image_pool.query(state, fill, jax.random.PRNGKey(0))
  assert int(state['count']) == 2

  incoming = jnp.asarray([[[[3.0]]], [[[4.0]]]])
  new_state, out = image_pool.query(state, incoming, jax.random.PRNGKey(1),
                                    p_pool_image=1.0)
  # With p=1 every image comes from the pool and is replaced by the input
  out_vals = set(np.asarray(out).ravel().tolist())
  assert out_vals <= {1.0, 2.0}
  pool_vals = set(np.asarray(new_state['images']).ravel().tolist())
  assert 3.0 in pool_vals and 4.0 in pool_vals

  _, out_keep = image_pool.query(state, incoming, jax.random.PRNGKey(2),
                                 p_pool_image=0.0)
  np.testing.assert_allclose(np.asarray(out_keep), np.asarray(incoming))


def test_image_pool_disabled():
  state = image_pool.init_pool(0, (1, 1, 1))
  assert state is None
  _, out = image_pool.query(None, jnp.ones((2, 1, 1, 1)),
                            jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(out), 1.0)


def test_multi_step_gen_phase_skips_disc_update_and_pool():
  """Gen-only phases must not run the pool-mixed detached pass or report
  disc losses (reference multi-step gen phase, adversarial_runner.py:470-525)."""
  conf = _conf()
  conf.generator_optimizer['updates_per_step'] = 2
  conf.discriminator_optimizer['updates_per_step'] = 1
  runner = build_runner(conf, 'adversarial', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4)
  losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  # one multi-step: D once (first batch), G twice
  assert int(runner.disc_state['step']) == 1
  assert int(runner.gen_state['step']) == 2
  # pool only fills during the single D phase (batch 4)
  assert int(runner.pool_state['count']) == 4


def test_resume_first_epoch_uses_scheduled_lrs():
  """Regression: scheduled gen/disc LRs requested before lazy state init
  (the --resume path) must apply once state materializes."""
  from csmri_refinement_tpu.training.optimizers import get_learning_rate

  sched = {'name': 'Adam', 'learning_rate': 0.0002, 'beta1': 0.5,
           'lr_scheduler': 'multistep', 'decay_steps': [2],
           'decay_factor': 0.5}
  conf = _conf(generator_optimizer=dict(sched),
               discriminator_optimizer=dict(sched))
  runner = build_runner(conf, 'adversarial', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size)
  assert runner.gen_state is None
  runner.epoch_beginning(5)  # before any batch → state still None
  runner.train_epoch(loader, 5, steps_per_train_summary=100)
  assert abs(get_learning_rate(runner.gen_state['opt_state']) - 1e-4) < 1e-9
  assert abs(get_learning_rate(runner.disc_state['opt_state']) - 1e-4) < 1e-9


def test_steps_per_fetch_scan_matches_per_step_trajectory():
  """steps_per_fetch throughput mode: lax.scan of k D-then-G updates per
  host fetch must reproduce the per-step trajectory EXACTLY (same key
  stream, same math) — only the loss-fetch cadence changes."""
  conf_a = _conf()
  runner_a = build_runner(conf_a, 'adversarial', 'train')
  train_set = load_dataset(conf_a, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  runner_a.train_epoch(loader, 1, steps_per_train_summary=100)

  conf_b = _conf(steps_per_fetch=2)
  runner_b = build_runner(conf_b, 'adversarial', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  losses_b, _ = runner_b.train_epoch(loader, 1, steps_per_train_summary=100)

  # 8 samples / batch 4 = 2 steps, scanned in one fetch
  assert int(runner_b.gen_state['step']) == 2
  assert int(runner_b.disc_state['step']) == 2
  assert all(np.isfinite(m.value) for m in losses_b.values())

  # identical key stream and math; only XLA fusion order differs between
  # the scanned and per-step programs, so tolerances are float-noise tight
  for tree_a, tree_b in ((runner_a.gen_state['params'],
                          runner_b.gen_state['params']),
                         (runner_a.disc_state['params'],
                          runner_b.disc_state['params'])):
    for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                    jax.tree_util.tree_leaves(tree_b)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 atol=1e-6, rtol=1e-5)
  np.testing.assert_allclose(np.asarray(runner_a.pool_state['images']),
                             np.asarray(runner_b.pool_state['images']),
                             atol=1e-5, rtol=1e-5)


def test_steps_per_fetch_ragged_final_batch():
  """drop_last=False loaders yield a short final batch; the adversarial
  scan chunker must hold it back for its own (shorter) scan instead of
  crashing np.stack — every sample trains exactly once (D and G)."""
  conf = _conf(steps_per_fetch=8,
               synthetic={'image_size': 32, 'num_train': 10, 'num_val': 4})
  runner = build_runner(conf, 'adversarial', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)  # batches 4, 4, 2
  losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
  assert int(runner.gen_state['step']) == 3
  assert int(runner.disc_state['step']) == 3
  assert runner._pending_host_batch is None
  assert all(np.isfinite(m.value) for m in losses.values())


def test_train_remat_matches_plain_trajectory():
  """train_remat rematerializes the gen/disc/VGG forwards in the backward
  (HBM-for-FLOPs; the plain 5-network step OOMs at batch 64 @256² on a
  v5e). Exactness contract: identical trajectory to the plain step."""
  conf_a = _conf()
  runner_a = build_runner(conf_a, 'adversarial', 'train')
  train_set = load_dataset(conf_a, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, 4, shuffle=False)
  runner_a.train_epoch(loader, 1, steps_per_train_summary=100)

  conf_b = _conf(train_remat=True)
  runner_b = build_runner(conf_b, 'adversarial', 'train')
  assert runner_b.train_remat
  assert runner_b.gen_criteria['VGG19'].criterion.remat
  loader = DataLoader(train_set, 4, shuffle=False)
  losses_b, _ = runner_b.train_epoch(loader, 1, steps_per_train_summary=100)
  assert all(np.isfinite(m.value) for m in losses_b.values())

  for tree_a, tree_b in ((runner_a.gen_state['params'],
                          runner_b.gen_state['params']),
                         (runner_a.disc_state['params'],
                          runner_b.disc_state['params'])):
    for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                    jax.tree_util.tree_leaves(tree_b)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 atol=1e-6, rtol=1e-5)
