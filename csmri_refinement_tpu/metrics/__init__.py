"""Metric registry and wrapper.

Rebuild of /root/reference/metrics/__init__.py:9-208. ``get_metric_fn``
resolves a metric name to a ``MetricFunction`` that unwraps dict outputs by
key, applies the application's output transform (e.g. complex→magnitude +
clamp for reconstruction), and computes the metric per example over the
batch, returning a Min/Max accumulator.

Per-metric config overrides (``<name>_metric`` keys: pred_key, target_key,
transform) follow reference metrics/__init__.py:181-194.
"""

from functools import partial

from csmri_refinement_tpu.metrics.metric import MaxMetric, MinMetric


class MetricFunction:
  """Wraps a per-example metric fn with key selection and output transform
  (reference metrics/__init__.py:9-72)."""

  def __init__(self, metric_fn, metric_type, transform=None,
               pred_key='pred', target_key='target'):
    self.metric_fn = metric_fn
    self.metric_type = metric_type
    self.transform = transform
    self.pred_key = pred_key
    self.target_key = target_key

  def __call__(self, prediction, target, transform=True):
    import numpy as np
    if isinstance(prediction, dict):
      prediction = prediction[self.pred_key]
    if isinstance(target, dict):
      target = target[self.target_key]

    # Fetch to host ONCE, then transform + score each example on small
    # (1, H, W, C) arrays. Eagerly transforming/slicing the full batched
    # device output is unsafe on tunneled TPU backends: at batch 128
    # (~33 MB arrays) it silently corrupts values (measured: SSIM 0.8688
    # vs the correct 0.9333, deterministic, while batch ≤16 agrees) and a
    # bare eager op on that size can hang outright. Per-example transforms
    # are semantically identical — every output transform is per-example
    # by construction (magnitude/clamp, softmax/argmax).
    prediction = _fetch_f32(prediction)
    if target is not None:
      target = _fetch_f32(target)

    def apply_one(p, t):
      if transform and self.transform is not None:
        p, t = self.transform(p, t)
      return self.metric_fn(p, t)

    if prediction.ndim in (3, 4):
      if target is not None:
        values = (apply_one(p[None], t[None])
                  for p, t in zip(prediction, target))
      else:
        values = (apply_one(p[None], None) for p in prediction)
    else:
      values = [apply_one(prediction, target)]

    values = (v for v in values if v is not None)
    return self.metric_type(values)


def _fetch_f32(array):
  """Device→host fetch that never transfers bf16 or complex.

  bf16 AND complex64 device→host transfers are UNIMPLEMENTED on the
  tunneled TPU backend (NOTES.md); such arrays must be cast on device
  (under jit — sizable eager ops hang there) before the fetch. Complex
  values fetch as packed (..., 2) re/im float32 — the repo's packed-complex
  convention.
  """
  import numpy as np
  if isinstance(array, np.ndarray):
    return array
  import jax
  import jax.numpy as jnp
  dtype = getattr(array, 'dtype', None)
  if dtype is not None and jnp.issubdtype(dtype, jnp.complexfloating):
    packed = jax.jit(lambda v: jnp.stack(
        [v.real.astype(jnp.float32), v.imag.astype(jnp.float32)], -1))(array)
    return np.asarray(packed).view(np.complex64).reshape(np.shape(array))
  if dtype == jnp.bfloat16:
    array = jax.jit(lambda v: v.astype(jnp.float32))(array)
  return np.asarray(array)


def _get_segmentation_score_metric(conf, metric_name):
  from csmri_refinement_tpu.metrics.segmentation_score import (
      SegmentationScore)
  from csmri_refinement_tpu.utils.config import Configuration
  assert conf.has_attr('segmentation_score_metric'), \
      ('Segmentation score metric needs additional config under key '
       '"segmentation_score_metric"')
  metric_conf = conf.segmentation_score_metric
  model_conf = Configuration.from_dict(metric_conf['model'])
  return SegmentationScore(
      model_conf, conf.file,
      class_idx=metric_conf.get('class'),
      save_segmentations_path=metric_conf.get('save_segmentations_path'),
      skip_empty_images=metric_conf.get('skip_empty_images', False))


def _get_average_dice_metric(conf, metric_name):
  from csmri_refinement_tpu.metrics.segmentation_metrics import (
      compute_average_dice)
  assert conf.has_attr('dice_metric'), \
      'Dice metric needs additional config under key "dice_metric"'
  metric_conf = conf.dice_metric
  assert 'num_classes' in metric_conf, \
      'Dice metric needs number of classes under key "num_classes"'
  exclude_bg = metric_conf.get('exclude_background', False)
  return partial(compute_average_dice,
                 num_classes=metric_conf['num_classes'],
                 excluded_class=0 if exclude_bg else -1)


def _get_disc_accuracy_metric(conf, metric_name):
  from csmri_refinement_tpu.metrics.scalar_metrics import disc_accuracy
  if metric_name in ('accuracy_fake', 'binary_accuracy'):
    fake, real = True, False
  elif metric_name == 'accuracy_real':
    fake, real = False, True
  elif metric_name == 'accuracy':
    fake, real = True, True
  else:
    raise ValueError('Unsupported metric {}'.format(metric_name))
  return partial(disc_accuracy, fake_accuracy=fake, real_accuracy=real)


def _image_metric(fn_name):
  from csmri_refinement_tpu.metrics import image_metrics
  return getattr(image_metrics, fn_name)


def _dice_metric(class_idx):
  from csmri_refinement_tpu.metrics.segmentation_metrics import compute_dice
  return partial(compute_dice, class_idx=class_idx)


_METRICS = {
    'psnr': (lambda conf, name: _image_metric('compute_psnr'), MaxMetric),
    'ssim': (lambda conf, name: _image_metric('compute_ssim'), MaxMetric),
    'hfen': (lambda conf, name: _image_metric('compute_hfen'), MinMetric),
    'mutual_information': (
        lambda conf, name: _image_metric('compute_mutual_information'),
        MaxMetric),
    'binary_accuracy': (_get_disc_accuracy_metric, MaxMetric),
    'accuracy': (_get_disc_accuracy_metric, MaxMetric),
    'accuracy_fake': (_get_disc_accuracy_metric, MaxMetric),
    'accuracy_real': (_get_disc_accuracy_metric, MaxMetric),
    'dice': (_get_average_dice_metric, MaxMetric),
    'dice_class_0': (lambda conf, name: _dice_metric(0), MaxMetric),
    'dice_class_1': (lambda conf, name: _dice_metric(1), MaxMetric),
    'dice_class_2': (lambda conf, name: _dice_metric(2), MaxMetric),
    'dice_class_3': (lambda conf, name: _dice_metric(3), MaxMetric),
    'segmentation_score': (_get_segmentation_score_metric, MaxMetric),
}


def get_metric_fn(conf, metric_name, mode,
                  pred_key='pred', target_key='target'):
  """Build a MetricFunction from config (reference metrics/__init__.py:161-197)."""
  from csmri_refinement_tpu.data.transform_wrappers import (
      get_output_transform)
  assert mode in ('train', 'test')
  assert metric_name in _METRICS, 'Unknown metric {}'.format(metric_name)

  metric_constructor, metric_type = _METRICS[metric_name]
  metric_fn = metric_constructor(conf, metric_name)

  metric_conf = conf.get_attr('{}_metric'.format(metric_name), default={})
  if metric_name == 'segmentation_score':
    # SIS by definition consumes the raw (complex, untransformed)
    # reconstruction and compares its segmentation against the GT *label*
    # (reference metrics/segmentation_score.py:49-79) — not the magnitude
    # output transform or the reconstruction target. Default accordingly;
    # both remain overridable via segmentation_score_metric.
    pred_key = metric_conf.get('pred_key', pred_key)
    target_key = metric_conf.get('target_key', 'label')
    metric_conf = dict(metric_conf)
    if 'transform' not in metric_conf or 'target_key' not in metric_conf:
      # NOTE: these defaults deliberately diverge from the reference
      # get_metric_fn (which would apply the application magnitude
      # transform and target_key='target' — unusable for SIS); log so a
      # config relying on reference behavior can spot the difference.
      import logging
      logging.getLogger(__name__).info(
          'segmentation_score: defaulting target_key=%r transform=%r '
          '(diverges from reference defaults by design; override via '
          'segmentation_score_metric)', target_key,
          metric_conf.get('transform', 'none'))
    metric_conf.setdefault('transform', 'none')
  else:
    pred_key = metric_conf.get('pred_key', pred_key)
    target_key = metric_conf.get('target_key', target_key)

  if 'transform' in metric_conf:
    transform = metric_conf['transform']
    transform = None if transform == 'none' \
        else get_output_transform(conf, transform, mode)
  else:
    transform = get_output_transform(conf, conf.application, mode)

  return MetricFunction(metric_fn, metric_type, transform,
                        pred_key, target_key)


def get_loss_metric(value):
  return MinMetric(value)


def accumulate_metric(dictionary, metric_name, metric):
  if metric_name in dictionary:
    dictionary[metric_name].accumulate(metric)
  else:
    dictionary[metric_name] = metric
