"""FFT helpers and complex⇄real packing on channel-last layout.

TPU-native replacement for the reference's two FFT stacks:

* numpy helpers ``mymath.fft2/ifft2/fft2c/ifft2c``
  (/root/reference/data/reconstruction/deep_med_lib/utils/mymath.py:8-42)
* the cuFFT-backed autograd Functions ``Fft2d/Ifft2d`` with hand-written
  conjugate-transpose backward passes
  (/root/reference/data/reconstruction/deep_med_lib/my_pytorch/myfft.py:21-128)

Here a single ``jnp.fft`` path serves both: XLA lowers FFT HLOs to the TPU's
native FFT, and autodiff through ``jnp.fft`` is exact — no manual backward.

Layout conventions (TPU-first, channel-last):

* complex images are ``complex64`` arrays ``(..., H, W)``
* packed images are ``float32`` arrays ``(..., H, W, 2)`` with
  ``[..., 0] = real`` and ``[..., 1] = imag`` (the reference packs as NCHW
  2-channel, dnn_io.complex2real at deep_med_lib/utils/dnn_io.py:4-23)
* ``fft2``/``ifft2`` are ortho-normalized and UNSHIFTED — undersampling masks
  for the data-consistency path are generated with ``centred=False``
  (reference myImageTransformations.py:78-81), so no fftshift appears in the
  hot loop
* ``fft2c``/``ifft2c`` are the centered (shifted) variants used by
  k-space center-cropping (reference CenterCropInKspace,
  myImageTransformations.py:935-954)
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# FFT backend selection: XLA's FFT HLO is exact and fast on CPU, but on TPU
# the MXU has no FFT unit — XLA's decomposition is slow to compile and run
# for batched 2D transforms. For the image sizes this framework works at
# (≤512), an explicit ortho DFT as two complex matmuls per axis runs on the
# MXU at full throughput and is the faster lowering by a wide margin
# (measured on v5e). Gradients remain exact: the DFT matrix is a constant,
# autodiff differentiates the matmuls.
#   auto (default): matmul-DFT on TPU-like backends, native FFT on CPU/GPU
#   CSMRI_TPU_FFT=xla|dft overrides.
_FFT_MODE = os.environ.get('CSMRI_TPU_FFT', 'auto')

# Set via set_spatial_mesh (forwarded from ops.dc.set_spatial_mesh, which
# parallel/mesh.mesh_from_conf flips): under a spatially-sharded mesh the
# GSPMD partitioner wraps FFT HLOs in layouts XLA:CPU's fft thunk
# RET_CHECKs on (LayoutUtil::IsMonotonicWithDim0Major, fft_thunk.cc:167) —
# seen from the on-device forward model (ops/undersample.py) when
# steps_per_fetch scans compose with a 2-D mesh. The matmul-DFT lowering
# partitions cleanly on every backend (same fix ops/dc.py applies to the
# DC op), so a spatial mesh forces it here too. TPU uses the DFT anyway;
# this only changes CPU/GPU mesh runs.
_SPATIAL_MESH = False


def set_spatial_mesh(active):
  """Force the matmul-DFT lowering for fft2/ifft2 while a spatially
  sharded mesh is active (see _SPATIAL_MESH comment)."""
  global _SPATIAL_MESH
  _SPATIAL_MESH = bool(active)


def _use_dft():
  if _FFT_MODE == 'dft':
    return True
  if _FFT_MODE == 'xla':
    return False
  if _SPATIAL_MESH:
    return True
  return jax.default_backend() not in ('cpu', 'gpu', 'cuda', 'rocm')


@functools.lru_cache(maxsize=16)
def _dft_matrix_np(n, inverse):
  """Unitary (ortho) DFT matrix of size n (host constant; cached as numpy
  so no traced values leak across jit scopes)."""
  mat = np.fft.fft(np.eye(n)) / np.sqrt(n)
  if inverse:
    mat = np.conj(mat)
  return mat.astype(np.complex64)


# Largest transform applied as one dense DFT matmul. Above this, one or more
# radix-2 Cooley-Tukey splits run instead (matmul FLOPs halve per level, at
# the cost of strided even/odd slices + concats over the whole batch).
# Measured on v5e at B128@512 (scripts/perf_dc512.py, NOTES round 3): the
# DENSE 512 DFT wins 2x over one split level (11.9 vs 22.2 ms per DC) —
# the slice/concat relayouts and narrower GEMMs cost far more than the 2x
# MAC saving, so splits only engage above 512 (1024+ images).
_RADIX_BASE = int(os.environ.get('CSMRI_TPU_DFT_RADIX_BASE', '512'))


@functools.lru_cache(maxsize=32)
def _scaled_dft_np(n, inverse, scale, twiddle_parent=0, row_side=True):
  """(conj-)DFT matrix of size n times `scale` (host constant).

  The radix recursion composes pure DFTs (no per-level normalization), so
  the ortho 1/sqrt(n_total) factor is folded into the base-case matrix.

  ``twiddle_parent`` > 0 additionally folds the radix-2 DIT twiddle
  diag(w) of that parent size into the matrix (diag(w) @ F for row
  transforms, F @ diag(w) for column transforms) — the odd half of the
  last split level then needs NO separate elementwise twiddle pass over
  the batch (measured win at 512^2, NOTES round 3).
  """
  mat = np.fft.fft(np.eye(n))
  if inverse:
    mat = np.conj(mat)
  mat = mat * scale
  if twiddle_parent:
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.arange(n) / twiddle_parent)
    mat = w[:, None] * mat if row_side else mat * w[None, :]
  return mat.astype(np.complex64)


@functools.lru_cache(maxsize=32)
def _twiddle_np(n, inverse):
  """Radix-2 DIT twiddles w_k = exp(∓2πi k/n), k < n/2."""
  sign = 2j if inverse else -2j
  return np.exp(sign * np.pi * np.arange(n // 2) / n).astype(np.complex64)


def _dft_axis(x, inverse, scale, last_axis):
  """(i)DFT·scale over rows (axis -2) or cols (axis -1) via MXU matmuls,
  with radix-2 splits above ``_RADIX_BASE`` (split halves recurse)."""
  n = x.shape[-1] if last_axis else x.shape[-2]
  if n <= _RADIX_BASE or n % 2:
    f = jnp.asarray(_scaled_dft_np(n, inverse, scale))
    if last_axis:  # x @ F (F symmetric — no transpose)
      return jnp.einsum('...hw,wl->...hl', x, f, precision='highest')
    return jnp.einsum('hk,...kw->...hw', f, x, precision='highest')
  # DIT split: X[k] = E[k] + w_k·O[k]; X[k+n/2] = E[k] - w_k·O[k]
  if last_axis:
    even, odd = x[..., 0::2], x[..., 1::2]
  else:
    even, odd = x[..., 0::2, :], x[..., 1::2, :]
  e = _dft_axis(even, inverse, scale, last_axis)
  half = n // 2
  if half <= _RADIX_BASE or half % 2:
    # children are dense: fold diag(w) into the odd child's matrix — no
    # elementwise twiddle pass over the batch
    f = jnp.asarray(_scaled_dft_np(half, inverse, scale,
                                   twiddle_parent=n, row_side=not last_axis))
    if last_axis:
      o = jnp.einsum('...hw,wl->...hl', odd, f, precision='highest')
    else:
      o = jnp.einsum('hk,...kw->...hw', f, odd, precision='highest')
  else:
    w = jnp.asarray(_twiddle_np(n, inverse))
    if not last_axis:
      w = w[:, None]
    o = w * _dft_axis(odd, inverse, scale, last_axis)
  return jnp.concatenate([e + o, e - o], axis=-1 if last_axis else -2)


def _dft2(x, inverse):
  """Ortho 2D (i)DFT over the last two axes via MXU matmuls."""
  n_h, n_w = x.shape[-2], x.shape[-1]
  x = _dft_axis(x, inverse, n_h ** -0.5, last_axis=False)
  x = _dft_axis(x, inverse, n_w ** -0.5, last_axis=True)
  return x


def pack_complex(x):
  """complex64 (..., H, W) → float32 (..., H, W, 2)."""
  return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).astype(jnp.float32)


def unpack_complex(x):
  """float32 (..., H, W, 2) → complex64 (..., H, W).

  Also accepts a single-channel array (..., H, W, 1), treated as real-valued
  (used for masks, which the reference stores via the ``m*(1+1j)`` hack,
  dnn_io.py:40-41 — here masks are honest single-channel reals).
  """
  if x.shape[-1] == 1:
    return x[..., 0].astype(jnp.complex64)
  return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def fft2(x):
  """Ortho-normalized, unshifted 2D FFT over the last two axes."""
  if _use_dft():
    return _dft2(x.astype(jnp.complex64), inverse=False)
  return jnp.fft.fft2(x, axes=(-2, -1), norm='ortho')


def ifft2(x):
  """Ortho-normalized, unshifted 2D inverse FFT over the last two axes."""
  if _use_dft():
    return _dft2(x.astype(jnp.complex64), inverse=True)
  return jnp.fft.ifft2(x, axes=(-2, -1), norm='ortho')


def fft2c(x, axes=(-2, -1)):
  """Centered ortho 2D FFT (ifftshift → fft2 → fftshift), reference
  mymath.fft2c (mymath.py:18-29)."""
  return jnp.fft.fftshift(
      jnp.fft.fft2(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm='ortho'),
      axes=axes)


def ifft2c(x, axes=(-2, -1)):
  """Centered ortho 2D inverse FFT, reference mymath.ifft2c (mymath.py:32-42)."""
  return jnp.fft.fftshift(
      jnp.fft.ifft2(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm='ortho'),
      axes=axes)


def complex_abs(x, keepdims=True):
  """Magnitude of a packed complex image (..., H, W, 2) → (..., H, W, 1).

  Reference utils/tensor_transforms.py:62-75 (NCHW there).
  """
  mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
  if keepdims:
    mag = mag[..., None]
  return mag
