"""On-device batch preparation: the k-space forward model inside the step.

The reference computes undersampling per-sample in DataLoader workers
(rec_transforms.py:45-57); here the host hands over clean GT slices and the
forward model runs inside the jitted train/val step on TPU (BASELINE.json
north star: "transform_wrappers undersampling-mask generation ... run as
device-side preprocessing").

Determinism contract:

* train: a fresh PRNG key per step → new random masks every batch
  (reference: unseeded np.random in workers)
* validation: mask key = fold_in(fixed base key, slice index) → the same
  mask for the same slice on every validation run, immune to worker-count
  and batch-order effects (fixes reference myImageTransformations.py:1204-1206)
* radial masks are data-independent and scatter-heavy → generated on host,
  cached per slice index for validation
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from csmri_refinement_tpu.ops import masks as mask_ops
from csmri_refinement_tpu.ops import undersample as us_ops

VAL_MASK_SEED = 0  # reference uses RandomState(seed=0) for fixed masks


class RecBatchPreparer:
  """Builds {inp, kspace, mask, target} batches from {gt, index} host
  batches, on device."""

  def __init__(self, conf):
    cs = conf.get_attr('undersampling', default={})
    self.scheme = cs.get('sampling_scheme', 'varden')
    self.acc = cs.get('acceleration_factor', 8)
    self.variable = cs.get('variable_acceleration', False)
    self.noise = cs.get('noise', 0.0)
    self._val_base_key = jax.random.PRNGKey(VAL_MASK_SEED)
    self._radial_val_masks = {}

    if self.scheme in ('varden', 'cartesian'):
      self._train_fn = jax.jit(functools.partial(
          us_ops.undersample_batch, sampling_scheme=self.scheme,
          acceleration_factor=self.acc,
          variable_acceleration=self.variable, noise=self.noise))
      self._val_fn = jax.jit(self._val_cartesian)
    else:
      self._train_fn = None  # host masks, jitted undersample only
      self._val_fn = None
    self._fixed_fn = jax.jit(
        lambda key, gt, mask: us_ops.undersample_batch(
            key, gt, fixed_mask=mask))

  def _val_cartesian(self, gt, indices):
    keys = jax.vmap(lambda i: jax.random.fold_in(self._val_base_key, i))(
        indices)
    return us_ops.undersample_batch(
        self._val_base_key, gt, sampling_scheme=self.scheme,
        acceleration_factor=self.acc, variable_acceleration=False,
        mask_keys=keys)

  def _radial_mask_for_index(self, index, height, width):
    if index not in self._radial_val_masks:
      rng = np.random.RandomState(VAL_MASK_SEED + int(index))
      self._radial_val_masks[index] = mask_ops.radial_sampling_np(
          (1, height, width), int(self.acc), rand=True, golden_angle=True,
          centred=False, rng=rng)[0]
    return self._radial_val_masks[index]

  @staticmethod
  def _passthrough(batch, host_batch):
    # Side-channel keys (labels for SIS, indices) ride along untouched
    for key in ('label', 'index'):
      if key in host_batch:
        batch[key] = jnp.asarray(host_batch[key])
    return batch

  @property
  def device_pure(self):
    """True when prepare_train is jit-pure (traceable under lax.scan):
    every scheme except radial, whose masks are generated host-side."""
    return self._train_fn is not None

  def prepare_train(self, rng, host_batch):
    gt = jnp.asarray(host_batch['gt'])
    if self._train_fn is not None:
      return self._passthrough(dict(self._train_fn(rng, gt)), host_batch)
    # Radial: host mask generation (data independent), device undersampling
    seed = int(jax.random.randint(rng, (), 0, 2 ** 31 - 1))
    mask = mask_ops.get_mask_generator_np(
        self.scheme, gt.shape, self.acc, self.variable,
        rng=np.random.RandomState(seed))()
    batch = self._fixed_fn(rng, gt, jnp.asarray(mask, dtype=jnp.float32))
    return self._passthrough(dict(batch), host_batch)

  def prepare_val(self, host_batch):
    gt = jnp.asarray(host_batch['gt'])
    indices = jnp.asarray(host_batch['index'])
    if self._val_fn is not None:
      return self._passthrough(dict(self._val_fn(gt, indices)), host_batch)
    b, h, w = gt.shape
    mask = np.stack([self._radial_mask_for_index(int(i), h, w)
                     for i in np.asarray(indices)])
    batch = self._fixed_fn(self._val_base_key, gt,
                           jnp.asarray(mask, dtype=jnp.float32))
    return self._passthrough(dict(batch), host_batch)


class SegBatchPreparer:
  """Segmentation batches pass through (inp/target already built on host)."""

  device_pure = True

  @staticmethod
  def prepare_train(rng, host_batch):
    return {'inp': jnp.asarray(host_batch['inp']),
            'target': jnp.asarray(host_batch['target'])}

  @staticmethod
  def prepare_val(host_batch):
    return SegBatchPreparer.prepare_train(None, host_batch)


def get_batch_preparer(conf):
  application = conf.get_attr('application', default='reconstruction')
  dataset_mode = conf.get_attr('dataset_mode', default=None)
  if dataset_mode == 'segmentation' or application == 'segmentation':
    return SegBatchPreparer()
  if application in ('reconstruction', 'none'):
    return RecBatchPreparer(conf)
  raise ValueError('Unknown application {}'.format(application))
