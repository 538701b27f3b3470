"""SegmentationScore — semantic interpretability score (SIS).

Rebuild of /root/reference/metrics/segmentation_score.py:13-79: a frozen
pretrained segmentation U-Net used as a metric network. The *reconstruction*
is fed through the net, softmax → argmax, and the dice against the GT label
is computed per requested class with absent_value=1.0. Supports
skip-empty-images and saving predicted segmentation maps as .npy.

The network forward (+argmax) is jitted once; dice runs on host.
"""

import os

import jax
import numpy as np

from csmri_refinement_tpu.metrics.segmentation_metrics import compute_dice
from csmri_refinement_tpu.models import construct_model
from csmri_refinement_tpu.training.model_setup import (
    apply_pretrained_weights)


class SegmentationScore:
  def __init__(self, model_conf, conf_path, class_idx,
               save_segmentations_path=None, skip_empty_images=False):
    self.model = construct_model(model_conf, model_conf.name)
    self.model_conf = model_conf
    self.conf_path = conf_path
    self.class_idxs = class_idx if isinstance(class_idx, list) \
        else [class_idx]
    self.skip_empty_images = skip_empty_images
    self.state = None  # lazy init on first call (needs input shape)

    self.save_segmentations_path = save_segmentations_path
    if save_segmentations_path is not None:
      parent_dir = os.path.dirname(save_segmentations_path)
      assert os.path.isdir(parent_dir), \
          'Did not find path {}'.format(parent_dir)
      os.makedirs(save_segmentations_path, exist_ok=True)
      self.num_saved_segmns = 0

    self._predict = None

  def _ensure_initialized(self, prediction):
    if self.state is not None:
      return
    variables = jax.jit(lambda x: self.model.init(
        {'params': jax.random.PRNGKey(0)}, x, train=False))(prediction)
    from flax.core import unfreeze
    variables = unfreeze(variables)
    self.state = {
        'params': variables.pop('params'),
        'batch_stats': variables.pop('batch_stats', {}),
    }
    apply_pretrained_weights(self.state, self.model_conf, self.conf_path)

    model = self.model

    from csmri_refinement_tpu.utils.compile_opts import serving_jit

    @serving_jit
    def predict(state, x):
      variables = {'params': state['params']}
      if state['batch_stats']:
        variables['batch_stats'] = state['batch_stats']
      # eval fidelity: see runner._make_val_step (bf16x3 for f32 models)
      with jax.default_matmul_precision('high'):
        logits = model.apply(variables, x, train=False)
      if isinstance(logits, dict):
        logits = logits['pred']
      return jax.numpy.argmax(logits, axis=-1)

    self._predict = predict

  def _save_segmentations(self, segmentations):
    for segmentation in segmentations:
      self.num_saved_segmns += 1
      path = os.path.join(self.save_segmentations_path,
                          '{:04d}_segm.npy'.format(self.num_saved_segmns))
      np.save(path, np.asarray(segmentation).astype(np.uint8))

  def __call__(self, prediction, target):
    """prediction: (B, H, W, C) reconstruction; target: dense label map."""
    target = np.asarray(target)
    if self.skip_empty_images:
      skip = all((target == class_idx).sum() == 0
                 for class_idx in self.class_idxs)
      if skip:
        return None

    self._ensure_initialized(prediction)
    predicted_classes = self._predict(self.state, prediction)

    if self.save_segmentations_path is not None:
      self._save_segmentations(predicted_classes)

    predicted_classes = np.asarray(predicted_classes)
    dices = [compute_dice(predicted_classes, target, class_idx,
                          absent_value=1.0)
             for class_idx in self.class_idxs]
    return sum(dices) / len(dices)
