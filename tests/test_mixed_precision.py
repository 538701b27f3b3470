"""Mixed-precision training (`train_dtype` config key).

The reference trains f32-only (PyTorch 0.3, environment.yml:17-18); the
TPU-native analogue of its "just use the GPU's fast path" is bf16 compute
with f32 master weights: `train_dtype: "bfloat16"` sets every network's
flax compute dtype (params/optimizer state stay f32, gradients return f32
through the cast), and loss reductions are pinned f32 by
``base_runner.cast_outputs_f32``. These tests verify the wiring on CPU;
the throughput evidence lives in NOTES.md (round 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.utils.config import Configuration


def _standard_conf(**overrides):
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
      'validation_metrics': ['psnr'],
  }
  base.update(overrides)
  return Configuration.from_dict(base)


def _adversarial_conf(**overrides):
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
              'decoder_act_upsampling_only': True},
      },
      'discriminator_model': {
          'num_inputs': 1,
          'input_method': 'simple-magnitude',
          'num_filters_per_layer': [8, 16],
          'strides': [2, 2],
          'kernel_sizes': 4,
          'final_conv_kernel_size': 4,
          'padding': 'reflection',
          'act_fn': 'lrelu',
          'relu_leakiness': 0.2,
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
  }
  base.update(overrides)
  return Configuration.from_dict(base)


def _train_steps(runner, conf, n=2):
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=0)
  losses = None
  it = iter(loader)
  for _ in range(n):
    _, losses, _ = runner._train_step(it)
  return losses


def _assert_all_f32(tree, what):
  leaves = jax.tree.leaves(tree)
  assert leaves, 'empty tree for {}'.format(what)
  for leaf in leaves:
    if jnp.issubdtype(leaf.dtype, jnp.floating):
      assert leaf.dtype == jnp.float32, \
          '{}: non-f32 leaf {}'.format(what, leaf.dtype)


def test_standard_bf16_params_stay_f32_and_loss_is_f32():
  conf = _standard_conf(train_dtype='bfloat16')
  runner = build_runner(conf, 'standard', 'train')
  assert runner.model.dtype == jnp.bfloat16
  losses = _train_steps(runner, conf)
  assert np.isfinite(losses['loss'].value)
  _assert_all_f32(runner.state['params'], 'params')
  _assert_all_f32(runner.state['opt_state'], 'opt_state')


def test_standard_bf16_close_to_f32_trajectory():
  """bf16 compute perturbs but must not derail the first steps: losses
  stay within a coarse relative band of the f32 run (catches wiring
  errors like double-casting or dropped master weights)."""
  losses = {}
  for dtype in (None, 'bfloat16'):
    over = {'train_dtype': dtype} if dtype else {}
    conf = _standard_conf(**over)
    runner = build_runner(conf, 'standard', 'train')
    losses[dtype] = _train_steps(runner, conf, n=2)['loss'].value
  assert losses['bfloat16'] == pytest.approx(losses[None], rel=0.15)


def test_standard_explicit_model_dtype_wins():
  conf = _standard_conf(train_dtype='bfloat16')
  conf.model['dtype'] = 'float32'
  runner = build_runner(conf, 'standard', 'train')
  assert runner.model.dtype == jnp.float32


def test_eval_mode_ignores_train_dtype():
  conf = _standard_conf(train_dtype='bfloat16')
  runner = build_runner(conf, 'standard', 'test')
  assert runner.model.dtype is None


def test_bf16_with_scan_and_2d_mesh():
  """train_dtype composes with the steps_per_fetch scan and a 2-D
  data×spatial mesh (bf16 activations ride the GSPMD halo exchanges)."""
  conf = _standard_conf(train_dtype='bfloat16', steps_per_fetch=2,
                        mesh={'data': 2, 'spatial': 2})
  runner = build_runner(conf, 'standard', 'train')
  losses = _train_steps(runner, conf, n=1)  # one scanned chunk = 2 updates
  assert np.isfinite(losses['loss'].value)
  _assert_all_f32(runner.state['params'], 'params')


@pytest.mark.slow
def test_adversarial_bf16_step_and_val():
  conf = _adversarial_conf(train_dtype='bfloat16')
  runner = build_runner(conf, 'adversarial', 'train')
  # dtype threaded through the wrapper to both sub-models, the disc, and
  # the VGG feature extractor
  assert runner.gen.pretrained_model.dtype == jnp.bfloat16
  assert runner.gen.learnable_model.dtype == jnp.bfloat16
  assert runner.disc.dtype == jnp.bfloat16
  assert runner.gen_criteria['VGG19'].criterion.vgg.dtype == jnp.bfloat16

  losses = _train_steps(runner, conf)
  for name in ('gen_loss', 'disc_loss'):
    assert np.isfinite(losses[name].value), name
  _assert_all_f32(runner.gen_state['params'], 'gen params')
  _assert_all_f32(runner.disc_state['params'], 'disc params')
  # BatchNorm running stats stay f32 (flax pins them independent of the
  # compute dtype); the pool buffer is f32 via the loss-boundary cast
  _assert_all_f32(runner.disc_state['batch_stats'], 'disc batch_stats')
  assert runner.pool_state['images'].dtype == jnp.float32

  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  _, val_losses, _ = runner.validate(DataLoader(val_set, 2))
  assert all(np.isfinite(m.value) for m in val_losses.values())
