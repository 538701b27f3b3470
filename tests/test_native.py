"""Native C++ host-pipeline tests (skipped if the library isn't built)."""

import numpy as np
import pytest

from csmri_refinement_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not built')


def test_normalize_matches_numpy(rng):
  data = (10 * rng.randn(4, 16, 16)).astype(np.float32)
  want = data / np.max(np.abs(data), axis=(1, 2), keepdims=True)
  got = native.normalize(data.copy())
  np.testing.assert_allclose(got, want, rtol=1e-5)


def test_prepare_batch_identity_no_augmentation(rng):
  slices = rng.rand(6, 16, 16).astype(np.float32)
  indices = np.array([3, 0, 5], np.int32)
  got = native.prepare_batch(slices, indices)
  want = slices[indices] / np.max(np.abs(slices[indices]), axis=(1, 2),
                                  keepdims=True)
  np.testing.assert_allclose(got, want, rtol=1e-5)


def test_prepare_batch_deterministic_per_seed(rng):
  slices = rng.rand(4, 16, 16).astype(np.float32)
  indices = np.array([0, 1], np.int32)
  a = native.prepare_batch(slices, indices, shift=2, max_rotate=10,
                           zoom_range=(0.9, 1.1), seed=7)
  b = native.prepare_batch(slices, indices, shift=2, max_rotate=10,
                           zoom_range=(0.9, 1.1), seed=7)
  np.testing.assert_array_equal(a, b)
  c = native.prepare_batch(slices, indices, shift=2, max_rotate=10,
                           zoom_range=(0.9, 1.1), seed=8)
  assert not np.array_equal(a, c)


def test_prepare_batch_augmentation_normalized(rng):
  slices = rng.rand(4, 32, 32).astype(np.float32)
  got = native.prepare_batch(slices, np.arange(4, dtype=np.int32),
                             shift=3, max_rotate=15, zoom_range=(0.8, 1.2),
                             seed=1)
  assert got.shape == (4, 32, 32)
  peaks = np.max(np.abs(got), axis=(1, 2))
  np.testing.assert_allclose(peaks, 1.0, rtol=1e-5)


def test_extract_slices_i16():
  vol = np.arange(2 * 3 * 4, dtype=np.int16).reshape(2, 3, 4, order='F')
  out = native.extract_slices_i16(vol, scale=2.0)
  assert out.shape == (4, 2, 3)
  want = 2.0 * np.transpose(np.asarray(vol, np.float32), (2, 0, 1))
  np.testing.assert_allclose(out, want)


def test_dataset_native_batch_path(rng):
  from csmri_refinement_tpu.data.datasets import SliceDataset
  from csmri_refinement_tpu.data.loader import DataLoader
  images = rng.rand(8, 16, 16).astype(np.float32)
  ds = SliceDataset(images, None, ['c01_pre_slice{:02d}'.format(i)
                                   for i in range(8)],
                    mode='reconstruction', image_size=16,
                    native_pipeline=True)
  assert ds._native is not None
  loader = DataLoader(ds, 4)
  batch = next(iter(loader))
  assert batch['gt'].shape == (4, 16, 16)
  # identical to the numpy path without augmentation
  want = np.stack([ds[i]['gt'] for i in range(4)])
  np.testing.assert_allclose(batch['gt'], want, rtol=1e-5)


def test_augment_extras(rng):
  from csmri_refinement_tpu.data import augment
  img = rng.rand(16, 16, 1).astype(np.float32)
  noisy = augment.gaussian_noise(img, 0.1, np.random.RandomState(0))
  assert noisy.shape == img.shape and not np.allclose(noisy, img)
  blurred = augment.gaussian_blur(img, 1.0)
  assert blurred.std() < img.std()
  assert augment.center_crop(img, 8).shape == (8, 8, 1)
  assert augment.random_crop(img, 8, np.random.RandomState(0)).shape == \
      (8, 8, 1)
