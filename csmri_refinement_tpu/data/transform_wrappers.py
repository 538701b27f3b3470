"""Config → transform factories (reference /root/reference/data/transform_wrappers.py).

Output transforms map (prediction, target) to the space metrics are computed
in, per application:

* reconstruction: complex 2ch → magnitude, clamped to (0, 1)
  (reference rec_transforms.output_transform, rec_transforms.py:79-85)
* segmentation: softmax → argmax, channel dim appended
  (reference seg_transforms.output_transform, seg_transforms.py:41-47)
* none: identity (used by validate --raw to dump raw matrices)

Input batch transforms are a no-op for all shipped applications, as in the
reference (transform_wrappers.py:107-124); the hook is kept for parity.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np


def _as_array(x):
  return jnp.asarray(x) if isinstance(x, np.ndarray) else x


@jax.jit
def _rec_output(pred, target):
  def mag_clamp(x):
    mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)[..., None]
    return jnp.clip(mag, 0.0, 1.0)
  return mag_clamp(pred), mag_clamp(target)


def get_rec_output_transform(conf, mode, **kwargs):
  def transform(pred, target):
    return _rec_output(_as_array(pred), _as_array(target))
  return transform


@jax.jit
def _seg_output(pred):
  # NHWC logits → dense class map with trailing channel dim
  classes = jnp.argmax(jax.nn.softmax(pred, axis=-1), axis=-1)
  return classes[..., None]


def get_seg_output_transform(conf, mode, **kwargs):
  def transform(pred, target):
    target = _as_array(target)
    if target.ndim == 3:  # (B, H, W) dense labels → (B, H, W, 1)
      target = target[..., None]
    return _seg_output(_as_array(pred)), target
  return transform


def get_output_transform(conf, application, mode, **kwargs):
  applications = {
      'reconstruction': get_rec_output_transform,
      'segmentation': get_seg_output_transform,
      'none': None,
  }
  assert application in applications, \
      'Unknown application {}'.format(application)
  if applications[application] is None:
    logging.debug('No output transform for application %s', application)
    return None
  return applications[application](conf, mode, **kwargs)


def get_input_batch_transform(conf, application, mode, **kwargs):
  applications = ('reconstruction', 'segmentation', 'none')
  assert application in applications, \
      'Unknown application {}'.format(application)
  return None
