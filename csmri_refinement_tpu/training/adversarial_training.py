"""Discriminator input pipeline.

Rebuild of /root/reference/training/adversarial_training.py:16-135 as pure
jit-safe functions: maps (prediction-or-target, conditional input, generator
outputs) → discriminator input, with

* methods ``simple`` and ``simple-magnitude`` (complex 2ch → magnitude,
  adversarial_training.py:27-40). As in the reference, the conditional
  input is computed but not concatenated by either method — the hook exists
  for custom methods.
* optional per-example mean/std normalization or (0,1) scaling of the
  conditional input (adversarial_training.py:28-29, 70-71)
* optional background-class stripping (adversarial_training.py:61-63)
* detach → ``stop_gradient``; image-pool mixing only on detached fake
  inputs (or any detached input under ``pool_label_swapping``,
  adversarial_training.py:42-53) — pool state is threaded explicitly by the
  adversarial runner.
"""

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.training import image_pool

DEFAULT_INPUT_METHOD = 'simple'


def _complex_abs(x):
  return jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)[..., None]


def _normalize_per_example(x):
  """Zero-mean unit-std per example+channel (reference
  utils/tensor_transforms.py:37-59)."""
  b, h, w, c = x.shape
  flat = x.reshape(b, h * w, c)
  flat = flat - jnp.mean(flat, axis=1, keepdims=True)
  flat = flat / (jnp.std(flat, axis=1, keepdims=True) + 1e-12)
  return flat.reshape(b, h, w, c)


def _scale_per_example(x):
  b, h, w, c = x.shape
  flat = x.reshape(b, h * w, c)
  flat = flat - jnp.min(flat, axis=1, keepdims=True)
  flat = flat / (jnp.max(flat, axis=1, keepdims=True) + 1e-12)
  return jnp.clip(flat, 0.0, 1.0).reshape(b, h, w, c)


class DiscriminatorInputFn:
  """Callable building discriminator inputs; optionally pool-mixing.

  Call signature (jit-safe; static python bools select the trace):
    fn(prediction_or_target, inp, out_gen, is_real_input, detach,
       pool_state=None, key=None) → (disc_input, new_pool_state)
  """

  def __init__(self, method, normalize=False, use_pool=False,
               pool_sample_prob=0.5, cond_input_source='input',
               cond_input_gen_key=None, strip_bg_class=False,
               scale_input_to_zero_one=False, pool_label_swapping=False):
    methods = {'simple', 'simple-magnitude'}
    assert method in methods, \
        'Unknown discriminator input method {}'.format(method)
    assert cond_input_source in ('input', 'generator')
    self.method = method
    self.normalize = normalize
    self.use_pool = use_pool
    self.pool_sample_prob = pool_sample_prob
    self.cond_input_source = cond_input_source
    self.cond_input_gen_key = cond_input_gen_key
    self.strip_bg_class = strip_bg_class
    self.scale_input_to_zero_one = scale_input_to_zero_one
    self.pool_label_swapping = pool_label_swapping

  def _build(self, prediction_or_target, inp, out_gen):
    prediction = prediction_or_target['pred'] \
        if isinstance(prediction_or_target, dict) else prediction_or_target

    if self.strip_bg_class:
      prediction = prediction[..., 1:]

    if self.cond_input_source == 'input':
      conditional_input = inp
    else:
      conditional_input = out_gen[self.cond_input_gen_key]
    if self.scale_input_to_zero_one:
      conditional_input = _scale_per_example(conditional_input)
    del conditional_input  # computed for parity; methods don't consume it

    if self.method == 'simple-magnitude':
      prediction = _complex_abs(prediction)
    if self.normalize:
      prediction = _normalize_per_example(prediction)
    return prediction

  def __call__(self, prediction_or_target, inp, out_gen, is_real_input,
               detach, pool_state=None, key=None):
    disc_input = self._build(prediction_or_target, inp, out_gen)
    if detach:
      disc_input = jax.lax.stop_gradient(disc_input)
      if self.use_pool and pool_state is not None and \
         (not is_real_input or self.pool_label_swapping):
        pool_state, disc_input = image_pool.query(
            pool_state, disc_input, key, self.pool_sample_prob)
    return disc_input, pool_state


def get_discriminator_input_fn(conf, disc_conf, no_pool=False):
  """Factory from config (reference adversarial_training.py:95-135)."""
  use_pool = disc_conf.get_attr('use_image_pool', default=False) and \
      not no_pool
  sample_prob = disc_conf.get_attr('image_pool_sample_prob', default=0.5)
  return DiscriminatorInputFn(
      method=disc_conf.get_attr('input_method',
                                default=DEFAULT_INPUT_METHOD),
      normalize=disc_conf.get_attr('normalize_input', default=False),
      use_pool=use_pool,
      pool_sample_prob=sample_prob,
      cond_input_source=disc_conf.get_attr('conditional_input_source',
                                           default='input'),
      cond_input_gen_key=disc_conf.get_attr(
          'conditional_input_generator_key'),
      strip_bg_class=disc_conf.get_attr('strip_bg_class', default=False),
      scale_input_to_zero_one=disc_conf.get_attr('scale_input_zero_one',
                                                 default=False),
      pool_label_swapping=disc_conf.get_attr('image_pool_label_swapping',
                                             default=False))
