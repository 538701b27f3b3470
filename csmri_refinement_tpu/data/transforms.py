"""Host-side per-item transforms feeding the device pipeline.

The reference computes the full forward model (mask gen + FFT undersampling)
per sample inside DataLoader workers
(/root/reference/data/reconstruction/rec_transforms.py:18-76). Here the host
pipeline stops after augmentation + k-space center-crop + normalization —
emitting clean GT slices — and undersampling runs on-device in the jitted
train/val step (ops.undersample.undersample_batch), per the TPU-first design.

``RecHostTransform`` ↔ reference train/test_transform (rec_transforms.py:18-76)
``RecSegHostTransform`` ↔ reference rec_seg_transforms train/test_transform
(rec_seg_transforms.py:16-77): joint translate/rotate/zoom with order-0 label
interpolation.
"""

import numpy as np

from csmri_refinement_tpu.data import augment


def center_crop_in_kspace_np(img, size):
  """Numpy twin of ops.undersample.center_crop_in_kspace (host pipeline).

  Reference CenterCropInKspace (myImageTransformations.py:935-954):
  fft2c → center crop → ifft2c → magnitude.
  """
  if isinstance(size, int):
    size = (size, size)
  nx, ny = img.shape[:2]
  k = np.fft.fftshift(
      np.fft.fft2(np.fft.ifftshift(img, axes=(0, 1)), axes=(0, 1),
                  norm='ortho'), axes=(0, 1))
  cx, cy = nx // 2, ny // 2
  th, tw = size
  k_crop = k[cx - th // 2: cx - th // 2 + th,
             cy - tw // 2: cy - tw // 2 + tw]
  out = np.fft.fftshift(
      np.fft.ifft2(np.fft.ifftshift(k_crop, axes=(0, 1)), axes=(0, 1),
                   norm='ortho'), axes=(0, 1))
  return np.abs(out)


def _apply_augmentation(image, augmentation, rng):
  """Single-image augmentation chain (rec_transforms.py:24-42 order):
  elastic → translate → rotate → zoom."""
  alpha = augmentation.get('elastic_transform_alpha')
  sigma = augmentation.get('elastic_transform_sigma')
  if alpha is not None and sigma is not None:
    image = augment.elastic_transform(image, alpha, sigma, rng)

  shift = augmentation.get('shift')
  if shift is not None:
    image = augment.random_translate(image, shift, rng)

  rot = augmentation.get('rotate')
  if rot is not None:
    image = augment.random_rotate(image, (-rot, rot), rng)

  zoom_range = augmentation.get('scale')
  if zoom_range is not None:
    image = augment.random_zoom(image, zoom_range, rng)
  return image


class RecHostTransform:
  """GT slice prep for reconstruction: augment → k-space crop → normalize."""

  def __init__(self, image_size, downscale=1, augmentation=None, rng=None):
    self.target_size = image_size // downscale
    self.augmentation = augmentation
    self.rng = rng if rng is not None else np.random

  def __call__(self, image):
    """image: (H, W) or (H, W, 1) raw slice → (size, size) float32 in (0,1)."""
    if image.ndim == 2:
      image = image[:, :, None]
    image = image.astype(np.float32)

    if self.augmentation is not None:
      image = _apply_augmentation(image, self.augmentation, self.rng)

    img2d = image[..., 0]
    if img2d.shape[0] != self.target_size or \
       img2d.shape[1] != self.target_size:
      img2d = center_crop_in_kspace_np(img2d, self.target_size)
    else:
      img2d = np.abs(img2d)

    peak = np.max(np.abs(img2d))
    if peak > 0:
      img2d = img2d / peak
    return img2d.astype(np.float32)


class RecSegHostTransform:
  """Joint image+label prep for segmentation training.

  Augmentation applies the same geometric transform to both parts, with
  order-0 interpolation for the label (rec_seg_transforms.py:39-54); the
  label branch is subsampled by ``downscale``.
  """

  def __init__(self, image_size, downscale=1, augmentation=None, rng=None,
               normalize=False, scale_by_max=False):
    """``normalize``/``scale_by_max`` mirror the reference's segmentation
    input-transform options (seg_transforms.input_transform,
    seg_transforms.py:7-38)."""
    self.target_size = image_size // downscale
    self.downscale = downscale
    self.augmentation = augmentation
    self.rng = rng if rng is not None else np.random
    self.normalize = normalize
    self.scale_by_max = scale_by_max

  def __call__(self, image, label):
    if image.ndim == 2:
      image = image[:, :, None]
    if label.ndim == 2:
      label = label[:, :, None]
    image = image.astype(np.float32)
    label = label.astype(np.float32)

    if self.augmentation is not None:
      shift = self.augmentation.get('shift', 0)
      rot = self.augmentation.get('rotate', 0)
      zoom_range = self.augmentation.get('scale', (1, 1))

      if shift:
        merged = np.concatenate([image, label], axis=-1)
        merged = augment.random_translate(merged, shift, self.rng)
        image, label = merged[..., :1], merged[..., 1:]
      image, label = augment.random_rotate_pair(
          image, label, (-rot, rot), self.rng, orders=(2, 0))
      image, label = augment.random_zoom_pair(
          image, label, zoom_range, self.rng, orders=(2, 0))

    img2d = image[..., 0]
    if img2d.shape[0] != self.target_size or \
       img2d.shape[1] != self.target_size:
      img2d = center_crop_in_kspace_np(img2d, self.target_size)
    else:
      img2d = np.abs(img2d)
    peak = np.max(np.abs(img2d))
    if peak > 0:
      img2d = img2d / peak

    if self.normalize:
      img2d = (img2d - img2d.mean()) / (img2d.std() + 1e-9)
    if self.scale_by_max:
      img2d = np.clip(img2d / (np.max(img2d) + 1e-9), 0, 1)

    label2d = label[::self.downscale, ::self.downscale, 0]
    return img2d.astype(np.float32), np.round(label2d).astype(np.int64)
