"""Image-quality metrics: PSNR, SSIM, HFEN, mutual information.

Rebuild of /root/reference/metrics/image_metrics.py. PSNR and SSIM are
jittable on-device functions (NHWC); HFEN and mutual information stay
host-side scipy/sklearn, exactly like the reference (image_metrics.py:61-64,
83-89) — they only run at validation time.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from csmri_refinement_tpu.ops import ssim as ssim_ops


@jax.jit
def _psnr_jit(prediction, target):
  mse = jnp.mean((prediction - target) ** 2)
  return 10.0 * jnp.log10(1.0 / mse)


def compute_psnr(prediction, target):
  """PSNR assuming (0, 1) range: 10·log10(1/mse)
  (reference image_metrics.py:7-19)."""
  return float(_psnr_jit(jnp.asarray(prediction), jnp.asarray(target)))


@functools.partial(jax.jit, static_argnames='window_size')
def _ssim_jit(prediction, target, window_size=11):
  return ssim_ops.ssim(prediction, target, window_size=window_size)


def compute_ssim(prediction, target, window_size=11):
  """Gaussian-windowed SSIM (reference image_metrics.py:22-42 via
  pytorch_ssim)."""
  return float(_ssim_jit(jnp.asarray(prediction), jnp.asarray(target),
                         window_size=window_size))


def compute_hfen(prediction, target):
  """Normalized high-frequency error norm: 15×15 LoG filter, sigma 1.5
  (reference image_metrics.py:45-70, truncate=4.5 → kernel size 15)."""
  from scipy.ndimage import gaussian_laplace
  pred = np.asarray(prediction)
  targ = np.asarray(target)
  pred_filtered = gaussian_laplace(pred, truncate=4.5, sigma=1.5)
  target_filtered = gaussian_laplace(targ, truncate=4.5, sigma=1.5)
  norm_diff = np.linalg.norm((pred_filtered - target_filtered).ravel())
  norm_target = np.linalg.norm(target_filtered.ravel())
  return float(norm_diff / norm_target)


def compute_mutual_information(prediction, target):
  """MI from a 256-bin joint histogram over (0,1)
  (reference image_metrics.py:73-89)."""
  from sklearn.metrics import mutual_info_score
  p_xy, _, _ = np.histogram2d(np.asarray(prediction).ravel(),
                              np.asarray(target).ravel(),
                              bins=256, range=((0, 1), (0, 1)),
                              density=True)
  return float(mutual_info_score(None, None, contingency=p_xy))
