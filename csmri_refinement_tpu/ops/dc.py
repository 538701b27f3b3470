"""K-space data-consistency operator — the RecNet hot op.

Rebuild of ``DataConsistencyInKspace``
(/root/reference/data/reconstruction/deep_med_lib/my_pytorch/myfft.py:131-163):

    k   = fft2(x)                    # ortho, unshifted
    out = (1 - mask) * k + k0        # noiseless merge (myfft.py:141)
    x'  = ifft2(out)

The reference needs a CUDA-only pytorch_fft extension plus hand-written
conjugate-transpose backward passes; here the whole op is a pure jittable
function on complex64 — XLA lowers to the TPU's native FFT and autodiff is
exact (verified against numerical gradients in tests/test_dc.py).

The elementwise k-space merge is also available as a Pallas kernel
(:mod:`csmri_refinement_tpu.ops.dc_pallas`); `data_consistency` picks it up
when enabled.
"""

import jax.numpy as jnp

from csmri_refinement_tpu.ops import fft

# Toggled by ops.dc_pallas at import or by perf config; keeps the numerics
# path dependency-free.
_USE_PALLAS_MERGE = False
_pallas_merge = None


def enable_pallas_merge(enable=True):
  """Opt into the Pallas fused merge kernel for supported shapes."""
  global _USE_PALLAS_MERGE, _pallas_merge
  if enable and _pallas_merge is None:
    from csmri_refinement_tpu.ops.dc_pallas import kspace_merge
    _pallas_merge = kspace_merge
  _USE_PALLAS_MERGE = enable


def kspace_merge_reference(k, k0, mask, noise_lvl=None):
  """Merge predicted k-space with sampled lines (myfft.py:131-142)."""
  if noise_lvl:
    return (1 - mask) * k + mask * (k + noise_lvl * k0) / (1 + noise_lvl)
  return (1 - mask) * k + k0


def data_consistency(x, k0, mask, noise_lvl=None):
  """Data-consistency step on packed arrays.

  Parameters
  ----------
  x : (B, H, W, 2) float — current image estimate (real/imag channels)
  k0 : (B, H, W, 2) float — originally sampled k-space
  mask : (B, H, W, 1) or (B, H, W, 2) float — 1 where k-space was sampled

  Returns
  -------
  (B, H, W, 2) float image with sampled k-space lines restored.
  """
  xc = fft.unpack_complex(x)
  k0c = fft.unpack_complex(k0)
  m = mask[..., 0]

  k = fft.fft2(xc)
  if _USE_PALLAS_MERGE and noise_lvl is None:
    out = _pallas_merge(k, k0c, m)
  else:
    out = kspace_merge_reference(k, k0c, m, noise_lvl)
  x_res = fft.ifft2(out)
  return fft.pack_complex(x_res)


def data_consistency_complex(xc, k0c, m, noise_lvl=None):
  """Same op on complex64 arrays (B, H, W); used inside fused cascades."""
  k = fft.fft2(xc)
  out = kspace_merge_reference(k, k0c, m, noise_lvl)
  return fft.ifft2(out)


def data_consistency_np(x, y, mask, norm='ortho'):
  """Host/numpy data consistency for golden tests
  (reference compressed_sensing.py:515-529, centered=False path)."""
  import numpy as np
  xf = np.fft.fft2(x, axes=(-2, -1), norm=norm)
  xm = (1 - mask) * xf + y
  return np.fft.ifft2(xm, axes=(-2, -1), norm=norm)
