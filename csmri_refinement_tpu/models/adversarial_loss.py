"""Adversarial losses: GAN (BCE), LSGAN, WGAN, FeatureMatching.

Rebuild of /root/reference/models/adversarial_loss.py:7-160 as pure jit-safe
functions over discriminator output dicts ``{prob, logits[, features]}``:

* GANLoss — BCE on ``prob`` with discriminator label smoothing
  (adversarial_loss.py:88-98; smoothing at :39)
* LeastSquaresLoss — MSE on ``logits`` (:101-111)
* WGANLoss — mean logits difference (:114-128)
* FeatureMatchingLoss — mean L1/MSE over discriminator feature lists,
  generator vs stop-gradient'd real features (:131-160)

The reference's detach of real features becomes an explicit
``jax.lax.stop_gradient``. Label tensors need no caching — they are
constants under jit.
"""

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _bce(probs, labels):
  probs = jnp.clip(probs, _EPS, 1.0 - _EPS)
  return -jnp.mean(labels * jnp.log(probs) +
                   (1.0 - labels) * jnp.log(1.0 - probs))


class GANLoss:
  """Non-saturating BCE GAN loss on probabilities."""

  def __init__(self, loss_type, disc_label_smoothing=0.0):
    assert loss_type in ('gen', 'disc')
    assert 0.0 <= disc_label_smoothing < 1.0
    self.loss_type = loss_type
    self.disc_real_label = 1.0 - disc_label_smoothing

  def __call__(self, out_disc_fake, out_disc_real):
    if self.loss_type == 'gen':
      # Generator maximizes D(fake) toward label 1
      return _bce(out_disc_fake['prob'],
                  jnp.ones_like(out_disc_fake['prob']))
    loss_fake = _bce(out_disc_fake['prob'],
                     jnp.zeros_like(out_disc_fake['prob']))
    loss_real = _bce(out_disc_real['prob'],
                     jnp.full_like(out_disc_real['prob'],
                                   self.disc_real_label))
    return loss_fake + loss_real


class LeastSquaresLoss:
  """LSGAN: MSE on logits."""

  def __init__(self, loss_type, disc_label_smoothing=0.0):
    assert loss_type in ('gen', 'disc')
    self.loss_type = loss_type
    self.disc_real_label = 1.0 - disc_label_smoothing

  def __call__(self, out_disc_fake, out_disc_real):
    if self.loss_type == 'gen':
      logits = out_disc_fake['logits']
      return jnp.mean((logits - 1.0) ** 2)
    loss_fake = jnp.mean(out_disc_fake['logits'] ** 2)
    loss_real = jnp.mean(
        (out_disc_real['logits'] - self.disc_real_label) ** 2)
    return loss_fake + loss_real


class WGANLoss:
  """Wasserstein loss on logits (no smoothing)."""

  def __init__(self, loss_type):
    assert loss_type in ('gen', 'disc')
    self.loss_type = loss_type

  def __call__(self, out_disc_fake, out_disc_real):
    if self.loss_type == 'gen':
      return -jnp.mean(out_disc_fake['logits'])
    return jnp.mean(out_disc_fake['logits']) - \
        jnp.mean(out_disc_real['logits'])


class FeatureMatchingLoss:
  """Average distance between fake and (detached) real disc features."""

  def __init__(self, loss_type, distance_fn='L1'):
    assert loss_type in ('gen', 'disc')
    distance_fns = {
        'MSE': lambda a, b: jnp.mean((a - b) ** 2),
        'L1': lambda a, b: jnp.mean(jnp.abs(a - b)),
    }
    assert distance_fn in distance_fns, \
        'Unknown distance function {}'.format(distance_fn)
    self.loss_type = loss_type
    self.distance_fn = distance_fns[distance_fn]

  def __call__(self, out_disc_fake, out_disc_real):
    loss = 0.0
    features_fake = out_disc_fake['features']
    features_real = out_disc_real['features']
    for f_fake, f_real in zip(features_fake, features_real):
      loss += self.distance_fn(f_fake, jax.lax.stop_gradient(f_real))
    loss = loss / len(features_fake)
    if self.loss_type == 'disc':
      return -1.0 * loss
    return loss


def get_adversarial_loss(conf, loss_name, loss_type):
  """Factory (reference adversarial_loss.py:7-24)."""
  assert loss_type in ('disc', 'gen')
  smoothing = conf.get_attr('discriminator_label_smoothing', default=0.0)

  upper = loss_name.upper()
  if upper == 'GAN':
    return GANLoss(loss_type, smoothing)
  if upper == 'LSGAN':
    return LeastSquaresLoss(loss_type, smoothing)
  if upper == 'WGAN':
    return WGANLoss(loss_type)
  if loss_name in ('FeatureMatching', 'feature-matching'):
    distance_fn = conf.get_attr('feature_matching_loss_distance_function',
                                default='L1')
    return FeatureMatchingLoss(loss_type, distance_fn)
  raise ValueError('Unknown loss {}'.format(loss_name))
