"""Offline per-slice statistics over saved result datasets.

Rebuild of /root/reference/data/reconstruction/statistics.py:26-104 without
skimage (unavailable in this image): PSNR and gaussian-weighted SSIM follow
the skimage formulas the reference calls (compare_psnr,
compare_ssim(gaussian_weights=True, sigma=1.5, use_sample_covariance=False) —
the original-publication settings, statistics.py:47-51), with
``data_range = target.max()``.
"""

from collections import OrderedDict

import numpy as np
import pandas as pd
from scipy.ndimage import gaussian_filter
from scipy.stats import wilcoxon

from csmri_refinement_tpu.data.io_mat import (CASE_KEY, LABEL_KEY, PRED_KEY,
                                              SLICE_KEY, TARGET_KEY,
                                              TARGET_LABEL_KEY,
                                              maybe_convert_to_magnitude)


def _get_index_key(data):
  if SLICE_KEY in data:
    return '{}_{:02d}'.format(data[CASE_KEY], int(data[SLICE_KEY]))
  return data[CASE_KEY]


def psnr(target, pred, data_range):
  mse = np.mean((target.astype(np.float64) -
                 pred.astype(np.float64)) ** 2)
  return 10.0 * np.log10((data_range ** 2) / mse)


def complex_psnr(x, y, peak='normalized'):
  """PSNR over complex arrays (reference deep_med_lib/utils/metric.py:36):
  'normalized' assumes unit peak; 'max' uses |x|'s maximum."""
  x = np.asarray(x)
  y = np.asarray(y)
  mse = np.mean(np.abs(x - y) ** 2)
  if peak == 'max':
    return 10.0 * np.log10(np.max(np.abs(x)) ** 2 / mse)
  return 10.0 * np.log10(1.0 / mse)


def ssim_gaussian(target, pred, data_range, sigma=1.5, truncate=3.5):
  """skimage-style SSIM: gaussian weights, population covariance, border
  crop of (win-1)//2 (skimage.metrics.structural_similarity semantics for
  the flags the reference uses)."""
  target = target.astype(np.float64)
  pred = pred.astype(np.float64)
  # skimage window size for gaussian weights: 2*int(truncate*sigma+0.5)+1
  win = 2 * int(truncate * sigma + 0.5) + 1

  filt = lambda x: gaussian_filter(x, sigma, truncate=truncate)

  ux = filt(target)
  uy = filt(pred)
  uxx = filt(target * target)
  uyy = filt(pred * pred)
  uxy = filt(target * pred)
  vx = uxx - ux * ux
  vy = uyy - uy * uy
  vxy = uxy - ux * uy

  c1 = (0.01 * data_range) ** 2
  c2 = (0.03 * data_range) ** 2

  ssim_map = ((2 * ux * uy + c1) * (2 * vxy + c2)) / \
      ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))

  pad = (win - 1) // 2
  cropped = ssim_map[pad:-pad, pad:-pad] if pad else ssim_map
  return cropped.mean()


def compute_psnr(dataset):
  values = OrderedDict()
  for data in dataset:
    pred = maybe_convert_to_magnitude(data[PRED_KEY])
    target = maybe_convert_to_magnitude(data[TARGET_KEY])
    values[_get_index_key(data)] = psnr(target, pred,
                                        data_range=target.max())
  return pd.Series(values)


def compute_ssim(dataset):
  values = OrderedDict()
  for data in dataset:
    pred = maybe_convert_to_magnitude(data[PRED_KEY]).squeeze()
    target = maybe_convert_to_magnitude(data[TARGET_KEY]).squeeze()
    values[_get_index_key(data)] = ssim_gaussian(target, pred,
                                                 data_range=target.max())
  return pd.Series(values)


def compute_seg_score(dataset, seg_score):
  """SIS over saved reconstructions (statistics.py:55-73); the network
  consumes (1, H, W, 2) complex reconstructions."""
  values = OrderedDict()
  for data in dataset:
    pred = np.asarray(data[PRED_KEY], np.float32)
    if pred.ndim == 3 and pred.shape[0] == 2 and pred.shape[-1] != 2:
      pred = np.transpose(pred, (1, 2, 0))  # reference CHW → HWC
    if pred.shape[-1] == 1:
      pred = np.concatenate([pred, np.zeros_like(pred)], axis=-1)
    target = np.asarray(data[TARGET_LABEL_KEY]).squeeze()

    value = seg_score(pred[None], target[None])
    if value is not None:
      values[_get_index_key(data)] = value
  return pd.Series(values)


def _dice(prediction, target, class_idx, absent_value):
  a = (np.asarray(prediction).squeeze() == class_idx)
  b = (np.asarray(target).squeeze() == class_idx)
  denom = np.sum(a) + np.sum(b)
  if denom == 0:
    return absent_value
  return 2.0 * np.sum(a * b) / denom


def compute_dice_scores(dataset, num_classes, absent_value=0.0):
  values_per_class = [OrderedDict() for _ in range(num_classes)]
  for data in dataset:
    pred = data[LABEL_KEY]
    target = data[TARGET_LABEL_KEY]
    index_key = _get_index_key(data)
    for class_idx in range(num_classes):
      values_per_class[class_idx][index_key] = _dice(pred, target,
                                                     class_idx,
                                                     absent_value)
  return [pd.Series(values, name='dice_class_{}'.format(class_idx))
          for class_idx, values in enumerate(values_per_class)]


def compute_wilcoxon(series1, series2):
  return wilcoxon(series1, series2)
