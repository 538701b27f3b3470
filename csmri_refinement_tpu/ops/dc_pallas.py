"""Pallas TPU kernel: fused k-space data consistency.

The BASELINE.json north star asks for RecNet's per-block DC step —
``fft2 → sampled-line merge → ifft2`` (reference
deep_med_lib/my_pytorch/myfft.py:145-163) — fused into a single kernel.

Formulation: at the working image sizes (≤512), the ortho FFT is two
matmuls with the unitary DFT matrix per transform (see ops/fft.py), so the
whole DC step for one image is 16 real (H×H)@(H×W) matmuls plus the
elementwise merge. This kernel runs all of it per batch element inside one
``pallas_call`` program: the image planes, DFT matrices, and every
intermediate stay in VMEM; HBM sees exactly one read of (x, k0, mask) and
one write of the output — versus 4 separate matmul kernels round-tripping
k-space through HBM in the unfused lowering.

Complex arithmetic is explicit split re/im planes on the MXU — packed
(…, 2) blocks would pad the 2-wide channel axis to the 128-lane tile (a
64× VMEM blowup), so re/im are separate (B, H, W) arrays here and the
packed layout is restored outside the kernel.

VMEM budget at H=W=256, f32: 0.25 MB per plane, ~12 live planes + 2 DFT
matrices < 4 MB.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from csmri_refinement_tpu.ops.fft import _dft_matrix_np


def _dc_kernel(xr_ref, xi_ref, k0r_ref, k0i_ref, m_ref, fr_ref, fi_ref,
               yr_ref, yi_ref):
  """One batch element; every ref is a (1, H, W) or (H, W) VMEM block."""
  xr = xr_ref[0]
  xi = xi_ref[0]
  fr = fr_ref[:]
  fi = fi_ref[:]

  # bf16x3 passes: one-pass MXU bf16 loses ~2e-2 on k-space merges
  dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGH)

  def cmul(ar, ai, br, bi):
    """Complex matmul on split planes: (ar + i·ai) @ (br + i·bi)."""
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)

  # Forward DFT: k = F @ x @ F (F symmetric — no transpose)
  tr, ti = cmul(fr, fi, xr, xi)
  kr, ki = cmul(tr, ti, fr, fi)

  # Sampled-line merge: out = (1 - m)·k + k0 (myfft.py:141)
  m = m_ref[0]
  kr = (1.0 - m) * kr + k0r_ref[0]
  ki = (1.0 - m) * ki + k0i_ref[0]

  # Inverse DFT: y = conj(F) @ k @ conj(F)
  tr, ti = cmul(fr, -fi, kr, ki)
  yr, yi = cmul(tr, ti, fr, -fi)

  yr_ref[0] = yr
  yi_ref[0] = yi


@functools.partial(jax.jit, static_argnames='interpret')
def dc_pallas(x, k0, mask, interpret=False):
  """Fused data-consistency for square images.

  Parameters match ops.dc.data_consistency: x (B,H,W,2), k0 (B,H,W,2),
  mask (B,H,W,1) float32. Requires H == W.
  """
  b, h, w, _ = x.shape
  assert h == w, 'fused DC kernel requires square images'
  f = _dft_matrix_np(h, inverse=False)
  fr = jnp.asarray(np.real(f), jnp.float32)
  fi = jnp.asarray(np.imag(f), jnp.float32)

  x = x.astype(jnp.float32)
  k0 = k0.astype(jnp.float32)
  m = mask[..., 0].astype(jnp.float32)

  plane = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
  matrix = lambda: pl.BlockSpec((h, w), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

  yr, yi = pl.pallas_call(
      _dc_kernel,
      out_shape=(jax.ShapeDtypeStruct((b, h, w), jnp.float32),
                 jax.ShapeDtypeStruct((b, h, w), jnp.float32)),
      grid=(b,),
      in_specs=[plane(), plane(), plane(), plane(), plane(),
                matrix(), matrix()],
      out_specs=(plane(), plane()),
      cost_estimate=pl.CostEstimate(
          flops=16 * 2 * h * h * w * b,
          bytes_accessed=4 * (5 * b * h * w + 2 * h * w + 2 * b * h * w),
          transcendentals=0),
      # ~12 live f32 planes + 2 DFT matrices: 512² needs ≈19 MB scoped VMEM
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=64 * 1024 * 1024),
      interpret=interpret,
  )(x[..., 0], x[..., 1], k0[..., 0], k0[..., 1], m, fr, fi)

  return jnp.stack([yr, yi], axis=-1)


def kspace_merge(k, k0, m):
  """Complex-domain merge (non-square/elementwise fallback path)."""
  return (1 - m) * k + k0
