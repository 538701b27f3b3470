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

import functools
import os

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.ops import fft

# DC backend selection: 'auto' picks the batched-GEMM
# split-real path on TPU-like backends (1.05 ms vs 2.37 ms for the Pallas
# per-image kernel and 3.3 ms for the complex matmul-DFT path at B128@256²
# on v5e — the big einsum GEMMs keep the MXU busy across the whole batch,
# where the per-image Pallas grid serializes 256³ matmuls).
# CSMRI_TPU_FUSED_DC=1 forces the Pallas kernel, =0 the complex path.
_FUSED_MODE = os.environ.get('CSMRI_TPU_FUSED_DC', 'auto')


def _gemm_mode(h, w, noise_lvl):
  """Pick the DC lowering: 'einsum' (batched GEMM split-real, any
  rectangular shape), 'pallas' (per-image fused kernel, square only), or
  None (complex matmul-DFT composition — CPU/GPU backends and the noisy
  merge variant, which only that path implements)."""
  if noise_lvl is not None:
    return None
  if _FUSED_MODE == '1':
    return 'pallas' if h == w else None  # Pallas kernel is square-only
  if _FUSED_MODE == '0':
    return None
  if jax.default_backend() in ('cpu', 'gpu', 'cuda', 'rocm'):
    return None
  return 'einsum'


@jax.custom_vjp
def _dc_fused(x, k0, mask):
  from csmri_refinement_tpu.ops.dc_pallas import dc_pallas
  # Interpret mode keeps the forced-fused path testable on CPU
  return dc_pallas(x, k0, mask, interpret=jax.default_backend() == 'cpu')


def _dc_fused_fwd(x, k0, mask):
  return _dc_fused(x, k0, mask), mask


def _dc_fused_bwd(mask, g):
  """DC is complex-linear: y = F⁻¹((1-m)·F x + k0).

  The x-Jacobian F⁻¹(1-m)F is Hermitian (unitary F, real diagonal mask), so
  its real-split transpose is the op itself: grad_x = DC(g, 0, m). The
  k0-Jacobian is the ortho inverse DFT, whose real-split transpose is the
  forward DFT: grad_k0 = fft2(g). (The reference hand-writes the same
  conjugate-transpose structure in myfft.py:36-46.)
  """
  zeros = jnp.zeros_like(g)
  grad_x = _dc_fused(g, zeros, mask)
  grad_k0 = fft.pack_complex(fft.fft2(fft.unpack_complex(g)))
  return grad_x, grad_k0, None


_dc_fused.defvjp(_dc_fused_fwd, _dc_fused_bwd)


def _split_mats(n, inverse, scale, twiddle_parent=0, row_side=True):
  import numpy as np
  f = fft._scaled_dft_np(n, inverse, scale, twiddle_parent, row_side)
  return (jnp.asarray(np.real(f), jnp.float32),
          jnp.asarray(np.imag(f), jnp.float32))


def _split_twiddle(n, inverse):
  import numpy as np
  w = fft._twiddle_np(n, inverse)
  return (jnp.asarray(np.real(w), jnp.float32),
          jnp.asarray(np.imag(w), jnp.float32))


def _dft_axis_split(br, bi, inverse, scale, last_axis):
  """Split-real (i)DFT·scale over rows (-2) or cols (-1) of (B, H, W)
  planes as batched GEMMs, with radix-2 Cooley-Tukey splits above
  ``fft._RADIX_BASE`` (matmul FLOPs halve per split level — the dense DFT
  is the wrong algorithm at 512+).

  The einsums compile to single large dot_generals (N = B·W resp.
  M = B·H), unlike a per-image Pallas grid — 2.3× faster at B128@256² on
  v5e.
  """
  n = br.shape[-1] if last_axis else br.shape[-2]
  if n <= fft._RADIX_BASE or n % 2:
    fr, fi = _split_mats(n, inverse, scale)
    # DC is precision-critical (quality target: 0.1 dB): TPU's default
    # matmul precision is one bf16 pass (~2e-2 abs error on these k-space
    # merges — measured); 'high' (bf16x3) restores ~1e-4, 'highest' would
    # double that cost again for digits the recon never sees.
    if last_axis:
      mm = lambda a, c: jnp.einsum('bhk,kw->bhw', a, c, precision='high')
    else:
      mm = lambda a, c: jnp.einsum('hk,bkw->bhw', c, a, precision='high')
    return (mm(br, fr) - mm(bi, fi), mm(bi, fr) + mm(br, fi))
  if last_axis:
    ev = (br[..., 0::2], bi[..., 0::2])
    od = (br[..., 1::2], bi[..., 1::2])
  else:
    ev = (br[..., 0::2, :], bi[..., 0::2, :])
    od = (br[..., 1::2, :], bi[..., 1::2, :])
  er, ei = _dft_axis_split(ev[0], ev[1], inverse, scale, last_axis)
  half = n // 2
  if half <= fft._RADIX_BASE or half % 2:
    # children are dense: fold the DIT twiddle diag(w) into the odd
    # child's matrices — skips the 6-pass elementwise complex twiddle
    # over the whole batch (the measured 512^2 DC overhead, NOTES r3)
    fr, fi = _split_mats(half, inverse, scale, twiddle_parent=n,
                         row_side=not last_axis)
    if last_axis:
      mm = lambda a, c: jnp.einsum('bhk,kw->bhw', a, c, precision='high')
    else:
      mm = lambda a, c: jnp.einsum('hk,bkw->bhw', c, a, precision='high')
    tr = mm(od[0], fr) - mm(od[1], fi)
    ti = mm(od[1], fr) + mm(od[0], fi)
  else:
    orr, oi = _dft_axis_split(od[0], od[1], inverse, scale, last_axis)
    wr, wi = _split_twiddle(n, inverse)
    if not last_axis:
      wr, wi = wr[:, None], wi[:, None]
    tr = wr * orr - wi * oi
    ti = wr * oi + wi * orr
  axis = -1 if last_axis else -2
  return (jnp.concatenate([er + tr, er - tr], axis=axis),
          jnp.concatenate([ei + ti, ei - ti], axis=axis))


@jax.custom_vjp
def _dc_einsum(x, k0, mask):
  """Split-real DC as batched GEMMs per transform side (radix-split DFT)."""
  h, w = x.shape[-3], x.shape[-2]
  hs, ws = h ** -0.5, w ** -0.5

  ar, ai = x[..., 0].astype(jnp.float32), x[..., 1].astype(jnp.float32)
  tr, ti = _dft_axis_split(ar, ai, False, hs, last_axis=False)  # F_h @ x
  kr, ki = _dft_axis_split(tr, ti, False, ws, last_axis=True)   # … @ F_w
  m = mask[..., 0].astype(jnp.float32)
  kr = (1.0 - m) * kr + k0[..., 0]
  ki = (1.0 - m) * ki + k0[..., 1]
  tr, ti = _dft_axis_split(kr, ki, True, hs, last_axis=False)   # conj(F_h) @ k
  yr, yi = _dft_axis_split(tr, ti, True, ws, last_axis=True)    # … @ conj(F_w)
  return jnp.stack([yr, yi], axis=-1)


def _dc_einsum_fwd(x, k0, mask):
  return _dc_einsum(x, k0, mask), mask


def _dc_einsum_bwd(mask, g):
  # Same Hermitian structure as the fused kernel's VJP (see _dc_fused_bwd)
  zeros = jnp.zeros_like(g)
  grad_x = _dc_einsum(g, zeros, mask)
  grad_k0 = fft.pack_complex(fft.fft2(fft.unpack_complex(g)))
  return grad_x, grad_k0, None


_dc_einsum.defvjp(_dc_einsum_fwd, _dc_einsum_bwd)


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
  mode = _gemm_mode(x.shape[-3], x.shape[-2], noise_lvl)
  if mode == 'einsum':
    return _dc_einsum(x, k0.astype(jnp.float32), mask)
  if mode == 'pallas':
    return _dc_fused(x, k0, mask)

  xc = fft.unpack_complex(x)
  k0c = fft.unpack_complex(k0)
  m = mask[..., 0]

  k = fft.fft2(xc)
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
