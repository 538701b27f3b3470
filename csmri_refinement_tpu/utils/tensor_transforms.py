"""Tensor transforms on NHWC jax arrays.

Rebuild of /root/reference/utils/tensor_transforms.py:20-138 — range
normalization/scaling, per-example min-max scaling and standardization,
complex magnitude, one-hot encoding, and a tensor-stats debug printer. All
functions are jit-safe.
"""

import logging

import jax
import jax.numpy as jnp


def normalize_range(tensor, source_range, clamp=True):
  """Scale from ``source_range`` to (0, 1) (reference :20-25)."""
  tensor = (tensor - source_range[0]) / (source_range[1] - source_range[0])
  if clamp:
    tensor = jnp.clip(tensor, source_range[0], source_range[1])
  return tensor


def scale_to_range(tensor, target_range, clamp=True):
  """Scale from (0, 1) to ``target_range`` (reference :28-33)."""
  tensor = tensor * (target_range[1] - target_range[0]) + target_range[0]
  if clamp:
    tensor = jnp.clip(tensor, target_range[0], target_range[1])
  return tensor


def scale_batch_per_example(tensor):
  """Min-max scale each example+channel to (0, 1) (reference :36-51).

  tensor: (B, H, W, C).
  """
  b, h, w, c = tensor.shape
  flat = tensor.reshape(b, h * w, c)
  flat = flat - jnp.min(flat, axis=1, keepdims=True)
  flat = flat / jnp.max(flat, axis=1, keepdims=True)
  return jnp.clip(flat, 0.0, 1.0).reshape(b, h, w, c)


def normalize_batch_per_example(tensor, normalize_mean=True,
                                normalize_std=True):
  """Standardize each example+channel (reference :54-75)."""
  b, h, w, c = tensor.shape
  flat = tensor.reshape(b, h * w, c)
  if normalize_mean:
    flat = flat - jnp.mean(flat, axis=1, keepdims=True)
  if normalize_std:
    flat = flat / jnp.std(flat, axis=1, keepdims=True)
  return flat.reshape(b, h, w, c)


def complex_abs(tensor):
  """(B, H, W, 2) → (B, H, W, 1) magnitude (reference :62-75)."""
  return jnp.sqrt(tensor[..., 0] ** 2 + tensor[..., 1] ** 2)[..., None]


def magnitude_image(tensor):
  """Magnitude + per-image (0, 1) min-max scale (reference :78-99)."""
  return scale_batch_per_example(complex_abs(tensor))


def convert_to_one_hot(tensor, num_classes=None):
  """Dense labels → one-hot with a trailing class axis (reference :102-123).

  ``num_classes`` must be given under jit (dynamic max is not traceable).
  """
  if num_classes is None:
    num_classes = int(jnp.max(tensor)) + 1
  return jax.nn.one_hot(tensor.astype(jnp.int32), num_classes)


def print_tensor_stats(t, prefix='', debug=False):
  """Log min/max/mean/std/median of a tensor (reference :126-138)."""
  import numpy as np
  t = np.asarray(t)
  s = ('{}: Min: {:.9f}, Max: {:.9f}, Avg: {:.9f}, Std: {:.9f}, '
       'Median: {:.9f}').format(prefix, float(t.min()), float(t.max()),
                                float(t.mean()), float(t.std()),
                                float(np.median(t)))
  (logging.debug if debug else logging.info)(s)
