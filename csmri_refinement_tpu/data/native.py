"""ctypes bindings for the native host-pipeline library (native/csmri_host.cc).

Provides the multithreaded C++ fast path for batch preparation (slice
gather + geometric augmentation + max-abs normalization) — the role the
reference fills with scipy/cv2 inside DataLoader worker processes
(SURVEY.md §2.7). Gracefully absent when the library isn't built
(``make -C native``); callers fall back to the numpy/scipy pipeline.

Note on fidelity: the native augmentation uses bilinear (order-1) sampling
with reflect borders and a combined rotate+zoom+translate inverse map; the
scipy reference pipeline applies the transforms sequentially with order-2
splines. Statistically equivalent augmentation, not bit-identical — it is
a throughput mode, enabled via ``native_pipeline: true`` in the config.
"""

import ctypes
import logging
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
  return os.path.join(os.path.dirname(os.path.dirname(
      os.path.dirname(os.path.abspath(__file__)))), 'native',
      'libcsmri_host.so')


def _try_build(path):
  """Build the library in place if a toolchain is available.

  The .so is not committed (binary); a fresh checkout self-builds on
  first use — a single g++ invocation, ~2 s.
  """
  import subprocess
  native_dir = os.path.dirname(path)
  if not os.path.exists(os.path.join(native_dir, 'Makefile')):
    return
  try:
    subprocess.run(['make', '-C', native_dir], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                   timeout=120)
  except Exception as e:  # no toolchain / build failure → numpy fallback
    logging.debug('Native host library build failed (%s)', e)


def load_library():
  """Load (once) the native library; returns None if unavailable."""
  global _LIB, _TRIED
  if _TRIED:
    return _LIB
  _TRIED = True
  path = _lib_path()
  if not os.path.exists(path):
    _try_build(path)
  if not os.path.exists(path):
    logging.debug('Native host library not built (%s); using numpy '
                  'pipeline', path)
    return None
  lib = ctypes.CDLL(path)
  lib.csmri_prepare_batch.argtypes = [
      ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
      ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
      ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
      ctypes.c_float, ctypes.c_uint64, ctypes.c_int32]
  lib.csmri_prepare_batch.restype = None
  lib.csmri_normalize.argtypes = [
      ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
      ctypes.c_int32]
  lib.csmri_normalize.restype = None
  lib.csmri_extract_slices_i16.argtypes = [
      ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_float),
      ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_float]
  lib.csmri_extract_slices_i16.restype = None
  _LIB = lib
  logging.info('Loaded native host pipeline from %s', path)
  return _LIB


def available():
  return load_library() is not None


def _fptr(arr):
  return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def prepare_batch(slices, indices, shift=0, max_rotate=0.0,
                  zoom_range=(1.0, 1.0), seed=0, num_threads=0):
  """Gather + augment + normalize a batch of GT slices.

  slices: (N, H, W) float32 contiguous pool; indices: (B,) int.
  Returns (B, H, W) float32.
  """
  lib = load_library()
  assert lib is not None, 'native library not available'
  slices = np.ascontiguousarray(slices, np.float32)
  indices = np.ascontiguousarray(indices, np.int32)
  b = len(indices)
  h, w = slices.shape[1], slices.shape[2]
  out = np.empty((b, h, w), np.float32)
  lib.csmri_prepare_batch(
      _fptr(slices), indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      _fptr(out), b, h, w, int(shift), float(max_rotate),
      float(zoom_range[0]), float(zoom_range[1]), int(seed) & (2**64 - 1),
      int(num_threads))
  return out


def normalize(data, num_threads=0):
  """In-place per-slice max-abs normalization of an (N, H, W) f32 array."""
  lib = load_library()
  assert lib is not None, 'native library not available'
  data = np.ascontiguousarray(data, np.float32)
  n = data.shape[0]
  hw = int(np.prod(data.shape[1:]))
  lib.csmri_normalize(_fptr(data), n, hw, int(num_threads))
  return data


def extract_slices_i16(volume_f_order, scale=1.0):
  """Fortran-ordered (dim1, dim2, nz) int16 volume → (nz, dim1, dim2) f32."""
  lib = load_library()
  assert lib is not None, 'native library not available'
  vol = np.asfortranarray(volume_f_order, np.int16)
  dim1, dim2, nz = vol.shape
  out = np.empty((nz, dim1, dim2), np.float32)
  lib.csmri_extract_slices_i16(
      vol.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), _fptr(out),
      dim1, dim2, nz, float(scale))
  return out
