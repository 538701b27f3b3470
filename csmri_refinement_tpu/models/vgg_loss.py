"""VGG perceptual loss.

Rebuild of /root/reference/models/vgg_loss.py:13-65: complex 2-channel
inputs become replicated 3-channel magnitude images (vgg_loss.py:44-49);
natural images are assumed in (−1, 1) and rescaled to (0, 1)
(vgg_loss.py:51-54); the loss is the weighted per-block L1/MSE between
prediction features and stop-gradient'd target features.

The VGG network is frozen: its parameters are closed over by the loss
callable and become constants of the compiled train step.
"""

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.models.vgg import VGG19, load_vgg19_params

_CRITERIONS = {
    'MSE': lambda a, b: jnp.mean((a - b) ** 2),
    'L1': lambda a, b: jnp.mean(jnp.abs(a - b)),
}


def _complex_to_rgb(x):
  mag = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)[..., None]
  return jnp.concatenate([mag, mag, mag], axis=-1)


class VGGLoss:
  def __init__(self, loss_name, blocks=-1, criterion='L1', weights=None,
               weights_path=None, conf_path=None, allow_random_init=False,
               remat=False, dtype=None):
    if loss_name != 'VGG19':
      raise ValueError('Unknown VGG loss {}'.format(loss_name))

    if blocks == -1:
      blocks = [VGG19.LAST_FEATURE_MAP]
    elif not isinstance(blocks, list):
      blocks = [blocks]
    self.blocks = blocks

    # dtype: compute dtype of the feature extractor (params stay f32);
    # set by mixed-precision training (`train_dtype` config key) — the
    # VGG stack is the GAN step's most MXU-friendly network (C up to 512)
    if isinstance(dtype, str):
      dtype = jnp.dtype(dtype)
    self.vgg = VGG19(output_blocks=tuple(blocks), dtype=dtype)
    self.vgg_params = load_vgg19_params(weights_path, conf_path,
                                        allow_random_init=allow_random_init)
    self.criterion = _CRITERIONS[criterion]
    # train_remat: recompute the prediction branch's VGG activations in the
    # backward instead of storing them (the VGG features dominate the GAN
    # step's activation HBM at large batch; the target branch is
    # stop-gradient'd so it stores nothing either way)
    self.remat = remat

    if weights is not None:
      assert len(weights) == len(blocks)
      self.weights = weights
    else:
      self.weights = [1.0] * len(blocks)

  def __call__(self, prediction, target):
    if prediction.shape[-1] == 2:  # complex images
      assert target.shape[-1] == 2
      prediction = _complex_to_rgb(prediction)
      target = _complex_to_rgb(jax.lax.stop_gradient(target))
    else:
      # Natural images assumed in (-1, 1) → (0, 1)
      prediction = jnp.clip((prediction + 1.0) / 2.0, -1.0, 1.0)
      target = jnp.clip((jax.lax.stop_gradient(target) + 1.0) / 2.0,
                        -1.0, 1.0)

    def features(x):
      return self.vgg.apply({'params': self.vgg_params}, x)

    pred_fn = jax.checkpoint(features) if self.remat else features
    pred_features = pred_fn(prediction)
    target_features = features(target)

    loss = 0.0
    for weight, pred_f, target_f in zip(self.weights, pred_features,
                                        target_features):
      # f32 loss epilogue: the reductions run in f32 even when the
      # feature extractor computes in bf16 (no-op for f32 features)
      loss += weight * self.criterion(
          pred_f.astype(jnp.float32),
          jax.lax.stop_gradient(target_f).astype(jnp.float32))
    return loss
