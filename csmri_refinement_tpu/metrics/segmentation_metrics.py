"""Dice metrics over dense class maps.

Rebuild of /root/reference/metrics/segmentation_metrics.py:4-63, with the
same absent-class conventions: a class missing from both prediction and
target counts as ``absent_value`` (0.0 by ACDC convention; the
SegmentationScore metric uses 1.0).
"""

import numpy as np


def compute_dice(prediction, target, class_idx, absent_value=0.0):
  """Dice score for one class between dense segmentation maps."""
  pred = np.asarray(prediction) == class_idx
  targ = np.asarray(target) == class_idx
  denom = pred.sum() + targ.sum()
  if denom == 0:
    return float(absent_value)
  return float(2.0 * np.logical_and(pred, targ).sum() / denom)


def compute_average_dice(prediction, target, num_classes,
                         excluded_class=-1, absent_value=0.0):
  """Average dice over classes, optionally excluding one (background)."""
  score = 0.0
  counted = 0
  for class_idx in range(num_classes):
    if class_idx == excluded_class:
      continue
    score += compute_dice(prediction, target, class_idx, absent_value)
    counted += 1
  return score / counted
