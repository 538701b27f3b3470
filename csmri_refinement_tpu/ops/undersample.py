"""K-space forward model: retrospective undersampling.

Rebuild of ``cs.undersample``
(/root/reference/data/reconstruction/deep_med_lib/utils/compressed_sensing.py:460-512)
as a jittable function, plus a batched on-device pipeline that turns a batch
of ground-truth magnitude slices into the training dict
``{inp, kspace, mask, target}`` — the work the reference does per-sample in
DataLoader worker processes (myImageTransformations.py:1196-1238) runs here
as one fused XLA program on TPU.
"""

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.ops import fft
from csmri_refinement_tpu.ops import masks as mask_ops


def undersample(x, mask, key=None, noise=0.0):
  """Undersample complex image(s) ``x`` with k-space ``mask``.

  Ortho-normalized, unshifted FFT (the reference calls with centred=False,
  norm='ortho' at myImageTransformations.py:88-90).

  Parameters
  ----------
  x : complex array (..., H, W)
  mask : float/bool array broadcastable to x's shape (1 = sampled)
  key : PRNG key for complex AWGN acquisition noise (only if noise > 0)
  noise : float, noise power as fraction of peak signal

  Returns
  -------
  (x_und, k_und): undersampled image (complex) and k-space (complex)
  """
  k = fft.fft2(x)
  if noise and key is not None:
    kr, ki = jax.random.split(key)
    nz = jnp.sqrt(0.5) * (jax.random.normal(kr, x.shape) +
                          1j * jax.random.normal(ki, x.shape))
    # Ortho norm multiplicative factor (compressed_sensing.py:497-501)
    nz = nz * jnp.sqrt(noise) * jnp.sqrt(
        jnp.prod(jnp.array(x.shape[-2:])).astype(jnp.float32))
    k = k + nz
  k_und = mask * k
  x_und = fft.ifft2(k_und)
  return x_und, k_und


def undersample_batch(key, gt, sampling_scheme='varden',
                      acceleration_factor=8, variable_acceleration=False,
                      noise=0.0, fixed_mask=None, mask_keys=None):
  """Full on-device forward model for a batch of GT slices.

  Parameters
  ----------
  key : PRNG key (ignored for mask gen if ``fixed_mask`` given)
  gt : float array (B, H, W) or (B, H, W, 1) — real ground-truth images,
    already normalized to (0, 1) by the data pipeline
  fixed_mask : optional (B, H, W) mask to use instead of sampling one
    (deterministic validation masks)
  mask_keys : optional (B,) per-example PRNG keys for deterministic
    per-slice masks (validation: key = fold_in(base, slice_index))

  Returns
  -------
  dict with NHWC float32 arrays matching the reference batch contract
  (scar_segmentation.py:212-224):
    inp    (B, H, W, 2) zero-filled reconstruction
    kspace (B, H, W, 2) undersampled k-space
    mask   (B, H, W, 1) sampling mask
    target (B, H, W, 2) ground truth as complex (imag = 0)
  """
  if gt.ndim == 4:
    gt = gt[..., 0]
  batch, height, width = gt.shape

  if fixed_mask is not None:
    mask = jnp.asarray(fixed_mask, dtype=jnp.float32)
  else:
    key, mask_key = jax.random.split(key)
    mask = mask_ops.make_masks(mask_key, batch, height, width,
                               sampling_scheme=sampling_scheme,
                               acceleration_factor=acceleration_factor,
                               variable_acceleration=variable_acceleration,
                               keys=mask_keys)

  x = gt.astype(jnp.complex64)
  x_und, k_und = undersample(x, mask, key=key, noise=noise)

  return {
      'inp': fft.pack_complex(x_und),
      'kspace': fft.pack_complex(k_und),
      'mask': mask[..., None].astype(jnp.float32),
      'target': fft.pack_complex(x),
  }


def center_crop_in_kspace(img, size):
  """Frequency-domain center crop (reference CenterCropInKspace,
  myImageTransformations.py:935-954).

  img: real array (H, W) → |ifft2c(crop(fft2c(img)))| of shape (size, size).
  Used to derive the working resolution from 512×512 source slices.
  """
  if isinstance(size, int):
    size = (size, size)
  k = fft.fft2c(img.astype(jnp.complex64), axes=(0, 1))
  h, w = img.shape[0], img.shape[1]
  ch, cw = h // 2, w // 2
  th, tw = size
  k_crop = jax.lax.dynamic_slice(
      k, (ch - th // 2, cw - tw // 2), (th, tw))
  return jnp.abs(fft.ifft2c(k_crop, axes=(0, 1)))
