"""Datasets: ScarSeg (Analyze-format LGE MRI) and Synthetic.

``SliceDataset`` mirrors the reference's ReconstructionDataset contract
(/root/reference/data/reconstruction/scar_seg/scar_segmentation.py:180-236):
3D volumes sliced to 2D items, reconstruction/segmentation modes, filename
and case/slice accessors. The item payload differs by design: the host emits
clean GT slices (+ labels) and the forward model runs on-device (see
data/transforms.py docstring).

Item contract:

* reconstruction mode: ``{'gt': (H, W) float32 in (0,1), 'index': int}``
* segmentation mode:   ``{'inp': (H, W, 2) float32 GT-as-complex,
                          'target': (H, W) int64 labels, 'index': int}``

The Synthetic dataset generates deterministic phantom-like slices (random
smooth ellipse phantoms) with matching segmentation labels, standing in for
the proprietary unreleased LGE data (reference README.md:7) in tests and
benchmarks.
"""

import logging
import os
import re
from itertools import chain

import numpy as np

from csmri_refinement_tpu.data.transforms import (RecHostTransform,
                                                  RecSegHostTransform)

IMAGE_SIZE = 512  # ScarSeg source resolution (scar_segmentation.py:22)
NUM_SLICES = 52
DEFAULT_SPLIT_RATIO = [4, 1, 1]

_CASE_REGEXP = re.compile(r'(c\d+\_(pre|post))\_slice(\d+)')

# Patient-level static split for ratio [4,1,1]
# (scar_segmentation.py:36-80) — dataset metadata, kept for compatibility.
STATIC_SPLIT = {
    'train': ['c03_pre', 'c43_pre', 'c47_post', 'c45_post', 'c24_post',
              'c13_pre', 'c49_post', 'c41_post', 'c46_pre', 'c26_pre',
              'c46_post', 'c38_post', 'c11_post', 'c20_post', 'c19_post',
              'c09_post', 'c26_post', 'c37_post', 'c44_post', 'c25_post',
              'c02_post', 'c25_pre', 'c28_post', 'c34_pre'],
    'val': ['c18_pre', 'c34_post', 'c54_pre', 'c17_post', 'c18_post',
            'c03_post'],
    'test': ['c43_post', 'c29_post', 'c44_pre', 'c13_post', 'c45_pre',
             'c48_post'],
}

_IMAGE_PATH = os.path.join('Analyze', 'LGE.img')
_LABEL_PATH = os.path.join('ManualSegmentation', 'ROI_1_M_MSP_New2.img')


class SliceDataset:
  """2D slices of 3D volumes with host-side prep transforms."""

  def __init__(self, images, labels, image_ids, mode='reconstruction',
               image_size=IMAGE_SIZE, downscale=1, augmentation=None,
               seed=0, name='SliceDataset', include_labels=False,
               native_pipeline=False):
    assert mode in ('reconstruction', 'segmentation')
    self.images = images
    self.labels = labels
    self.image_ids = image_ids
    self.mode = mode
    self.name = name
    # include_labels: attach the (un-augmented) label to reconstruction
    # items, enabling validation-time SegmentationScore
    self.include_labels = include_labels and labels is not None
    self.downscale = downscale
    self.seed = seed
    self.augmentation = augmentation
    rng = np.random.RandomState(seed)
    if mode == 'reconstruction':
      self.transform = RecHostTransform(image_size, downscale,
                                        augmentation, rng)
    else:
      self.transform = RecSegHostTransform(image_size, downscale,
                                           augmentation, rng)

    # Native C++ batch fast path (data/native.py): usable when no k-space
    # center-crop is needed and items carry no labels.
    self._native = None
    if (native_pipeline and mode == 'reconstruction' and
        not self.include_labels and
        images.shape[-1] == image_size // downscale and
        images.shape[-2] == image_size // downscale):
      from csmri_refinement_tpu.data import native
      if native.available():
        self._native = native
        self._native_slices = np.ascontiguousarray(images, np.float32)
        self._native_counter = 0

  def native_batch(self, indices):
    """Prepare a whole batch in the native library (None if unavailable)."""
    if self._native is None:
      return None
    aug = self.augmentation or {}
    self._native_counter += 1
    gt = self._native.prepare_batch(
        self._native_slices, np.asarray(indices, np.int32),
        shift=aug.get('shift', 0) or 0,
        max_rotate=aug.get('rotate', 0) or 0,
        zoom_range=tuple(aug.get('scale', (1.0, 1.0))),
        seed=self.seed * 1000003 + self._native_counter)
    return {'gt': gt, 'index': np.asarray(indices, np.int32)}

  def __len__(self):
    return len(self.images)

  def __getitem__(self, index):
    image = self.images[index]
    if self.mode == 'reconstruction':
      gt = self.transform(image)
      item = {'gt': gt, 'index': np.int32(index)}
      if self.include_labels:
        label = self.labels[index][::self.downscale, ::self.downscale]
        item['label'] = np.round(label).astype(np.int64)
      return item
    label = self.labels[index]
    gt, label = self.transform(image, label)
    inp = np.stack([gt, np.zeros_like(gt)], axis=-1)
    return {'inp': inp, 'target': label, 'index': np.int32(index)}

  def get_filename(self, index):
    return self.image_ids[index]

  @staticmethod
  def get_case_and_slice(name):
    m = _CASE_REGEXP.match(name)
    assert m is not None, name
    return m.group(1), m.group(3)


# ---------------------------------------------------------------------------
# ScarSeg (real data; requires the unreleased LGE dataset on disk)
# ---------------------------------------------------------------------------

def _split_scarseg(data_dir, ratio, static_split=True):
  if static_split:
    splits = [[os.path.join(data_dir, pid) for pid in STATIC_SPLIT[fold]]
              for fold in ('train', 'val', 'test')]
    for path in chain(*splits):
      assert (os.path.isfile(os.path.join(path, _IMAGE_PATH)) and
              os.path.isfile(os.path.join(path, _LABEL_PATH))), \
          'Did not find image or label for {}'.format(path)
    return splits

  import glob
  ratio = np.array(ratio, float) / sum(ratio)
  paths = []
  for folder in sorted(glob.glob(os.path.join(data_dir, 'c*'))):
    if os.path.isfile(os.path.join(folder, _IMAGE_PATH)) and \
       os.path.isfile(os.path.join(folder, _LABEL_PATH)):
      paths.append(folder)
  rng = np.random.RandomState(seed=0)
  rng.shuffle(paths)
  n = len(paths)
  n_train, n_val, _ = (int(n * r) for r in ratio)
  return (paths[:n_train], paths[n_train:n_train + n_val],
          paths[n_train + n_val:])


def _load_scarseg_volumes(case_paths, nz=NUM_SLICES):
  from csmri_refinement_tpu.data.analyze_io import load_analyze
  images, labels, image_ids = [], [], []
  for path in case_paths:
    image = load_analyze(os.path.join(path, _IMAGE_PATH))[..., :nz]
    label = load_analyze(os.path.join(path, _LABEL_PATH))[..., :nz]
    images.append(image)
    labels.append(label)
    for sl in range(nz):
      image_ids.append('{}_slice{}'.format(os.path.basename(path), sl))
  images = np.array(images)
  labels = np.array(labels)
  # (cases, H, W, nz) → (cases·nz, H, W)
  n, h, w, nz = images.shape
  images = images.transpose((0, 3, 1, 2)).reshape(-1, h, w)
  labels = labels.transpose((0, 3, 1, 2)).reshape(-1, h, w)
  return images, labels, image_ids


def _build_scarseg(conf, data_dir, fold):
  data_path = os.path.join(data_dir, 'scar_segmentation')
  ratio = conf.get_attr('split_ratio', default=DEFAULT_SPLIT_RATIO)
  static = not conf.get_attr('random_split', default=False)
  fold_idx = ('train', 'val', 'test').index(fold)
  case_paths = _split_scarseg(data_path, ratio, static)[fold_idx]
  images, labels, image_ids = _load_scarseg_volumes(case_paths)

  mode = conf.get_attr('dataset_mode', default='reconstruction')
  augmentation = conf.get_attr('augmentation') if fold == 'train' else None
  return SliceDataset(
      images, labels, image_ids, mode=mode, image_size=IMAGE_SIZE,
      downscale=conf.get_attr('downscale', default=1),
      augmentation=augmentation, seed=conf.seed, name='ScarSeg',
      include_labels=conf.get_attr('include_labels', default=False),
      native_pipeline=conf.get_attr('native_pipeline', default=False))


# ---------------------------------------------------------------------------
# Synthetic phantom dataset (CPU-runnable stand-in; BASELINE.json config 1)
# ---------------------------------------------------------------------------

def _make_phantoms(num_images, size, seed, num_ellipses=6):
  """Deterministic smooth ellipse phantoms + 2-class labels.

  Each image: dark background + several soft-edged ellipses of varying
  intensity; the label marks the interior of the brightest ellipse
  (class 1) vs background (class 0) — enough structure for reconstruction
  and segmentation smoke training.
  """
  rng = np.random.RandomState(seed)
  yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
  images = np.zeros((num_images, size, size), np.float32)
  labels = np.zeros((num_images, size, size), np.int64)
  for i in range(num_images):
    img = np.zeros((size, size), np.float32)
    best_mask, best_val = None, -1.0
    for _ in range(num_ellipses):
      cx, cy = rng.uniform(0.2, 0.8, 2)
      ax, ay = rng.uniform(0.05, 0.3, 2)
      theta = rng.uniform(0, np.pi)
      amp = rng.uniform(0.2, 1.0)
      xr = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta)
      yr = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta)
      d = (xr / ax) ** 2 + (yr / ay) ** 2
      soft = np.clip(1.0 - d, 0.0, 1.0) ** 0.5
      img += amp * soft
      if amp > best_val:
        best_val, best_mask = amp, (d < 0.7)
    img = img / max(img.max(), 1e-6)
    images[i] = img
    labels[i][best_mask] = 1
  return images, labels


def _build_synthetic(conf, data_dir, fold):
  synth = conf.get_attr('synthetic', default={})
  size = synth.get('image_size', 256)
  sizes = {'train': synth.get('num_train', 64),
           'val': synth.get('num_val', 16),
           'test': synth.get('num_test', 16)}
  fold_seed = {'train': 0, 'val': 1, 'test': 2}[fold] + 100 * conf.seed
  images, labels = _make_phantoms(sizes[fold], size, fold_seed)
  image_ids = ['c00_pre_slice{:02d}'.format(i) for i in range(len(images))]

  mode = conf.get_attr('dataset_mode', default='reconstruction')
  augmentation = conf.get_attr('augmentation') if fold == 'train' else None
  return SliceDataset(images, labels, image_ids, mode=mode,
                      image_size=size,
                      downscale=conf.get_attr('downscale', default=1),
                      augmentation=augmentation, seed=conf.seed,
                      name='Synthetic',
                      include_labels=conf.get_attr('include_labels',
                                                   default=False),
                      native_pipeline=conf.get_attr('native_pipeline',
                                                    default=False))


_DATASET_BUILDERS = {
    'ScarSeg': _build_scarseg,
    'Synthetic': _build_synthetic,
}


def is_dataset(dataset_name):
  return dataset_name in _DATASET_BUILDERS


def load_dataset(conf, data_dir, dataset_name, fold):
  """Dataset registry dispatch (reference data/__init__.py:24-51)."""
  assert fold in ('train', 'val', 'test')
  assert dataset_name in _DATASET_BUILDERS, \
      'Unknown dataset {}'.format(dataset_name)
  logging.debug('Loading dataset %s fold %s', dataset_name, fold)
  return _DATASET_BUILDERS[dataset_name](conf, data_dir, fold)
