"""Loss math, wrapper modes, activation/norm factories, upsampling golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.models.adversarial_loss import (
    FeatureMatchingLoss, GANLoss, LeastSquaresLoss, WGANLoss,
    get_adversarial_loss)
from csmri_refinement_tpu.models import criteria
from csmri_refinement_tpu.utils.config import Configuration


def _outs(rng):
  fake = {'prob': jnp.asarray(rng.rand(2, 4, 4, 1).astype(np.float32)),
          'logits': jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32)),
          'features': [jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)),
                       jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))]}
  real = {'prob': jnp.asarray(rng.rand(2, 4, 4, 1).astype(np.float32)),
          'logits': jnp.asarray(rng.randn(2, 4, 4, 1).astype(np.float32)),
          'features': [jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32)),
                       jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))]}
  return fake, real


def test_lsgan_loss(rng):
  fake, real = _outs(rng)
  disc = LeastSquaresLoss('disc', 0.1)
  want = np.mean(np.asarray(fake['logits']) ** 2) + \
      np.mean((np.asarray(real['logits']) - 0.9) ** 2)
  assert float(disc(fake, real)) == pytest.approx(want, rel=1e-5)

  gen = LeastSquaresLoss('gen')
  want = np.mean((np.asarray(fake['logits']) - 1.0) ** 2)
  assert float(gen(fake, real)) == pytest.approx(want, rel=1e-5)


def test_wgan_loss(rng):
  fake, real = _outs(rng)
  disc = WGANLoss('disc')
  want = np.mean(np.asarray(fake['logits'])) - \
      np.mean(np.asarray(real['logits']))
  assert float(disc(fake, real)) == pytest.approx(want, rel=1e-5)
  gen = WGANLoss('gen')
  assert float(gen(fake, real)) == pytest.approx(
      -np.mean(np.asarray(fake['logits'])), rel=1e-5)


def test_feature_matching_loss(rng):
  fake, real = _outs(rng)
  fm = FeatureMatchingLoss('gen', 'L1')
  want = np.mean([np.mean(np.abs(np.asarray(f) - np.asarray(r)))
                  for f, r in zip(fake['features'], real['features'])])
  assert float(fm(fake, real)) == pytest.approx(want, rel=1e-5)
  # disc direction is the negation (adversarial_loss.py:149-150)
  fm_disc = FeatureMatchingLoss('disc', 'L1')
  assert float(fm_disc(fake, real)) == pytest.approx(-want, rel=1e-5)

  # gradients do not flow into real features (stop_gradient)
  def loss_wrt_real(real_feats):
    return fm({'features': fake['features']}, {'features': real_feats})
  grads = jax.grad(loss_wrt_real)(real['features'])
  assert all(float(jnp.abs(g).max()) == 0.0 for g in grads)


def test_adversarial_loss_factory():
  conf = Configuration.from_dict({'discriminator_label_smoothing': 0.2})
  assert isinstance(get_adversarial_loss(conf, 'gan', 'disc'), GANLoss)
  assert isinstance(get_adversarial_loss(conf, 'LSGAN', 'gen'),
                    LeastSquaresLoss)
  assert isinstance(get_adversarial_loss(conf, 'WGAN', 'disc'), WGANLoss)
  assert isinstance(
      get_adversarial_loss(conf, 'feature-matching', 'gen'),
      FeatureMatchingLoss)
  with pytest.raises(ValueError):
    get_adversarial_loss(conf, 'nope', 'gen')


def test_criterion_registry_errors():
  conf = Configuration.from_dict({})
  with pytest.raises(ValueError):
    criteria.get_criterion(conf, 'NotALoss')
  with pytest.raises(AssertionError):
    criteria.get_criterion(conf, 'FeaturePenalty')  # missing config


def test_nll_loss(rng):
  log_probs = jax.nn.log_softmax(
      jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32)), axis=-1)
  labels = jnp.asarray(rng.randint(0, 3, (2, 4, 4)))
  got = float(criteria.nll_loss(log_probs, labels))
  want = float(criteria.cross_entropy_loss(log_probs, labels))
  # NLL of log-softmax equals CE of the same logits only up to the softmax
  # renormalization; instead verify against a direct gather
  lp = np.asarray(log_probs)
  lb = np.asarray(labels)
  manual = -np.mean([lp[b, i, j, lb[b, i, j]]
                     for b in range(2) for i in range(4) for j in range(4)])
  assert got == pytest.approx(manual, rel=1e-5)


def test_refinement_wrapper_add_mode_and_concat_input():
  from csmri_refinement_tpu.models.recnet import RecNet
  from csmri_refinement_tpu.models.unet import UNET
  from csmri_refinement_tpu.models.refinement_wrapper import (
      RefinementWrapper)

  pretrained = RecNet(num_blocks=1, num_convs=2, num_filters=4)
  learnable = UNET(num_inputs=4, num_outputs=2, num_layers_per_scale=1,
                   encode_filters=[4, 8], decode_filters=[4],
                   output_activation='none', use_bn=False)
  model = RefinementWrapper(pretrained_model=pretrained,
                            learnable_model=learnable, mode='add',
                            input_mode='concat')
  inp = jnp.ones((1, 16, 16, 2)) * 0.5
  ksp = jnp.zeros((1, 16, 16, 2))
  mask = jnp.zeros((1, 16, 16, 1))
  variables = model.init(jax.random.PRNGKey(0), inp, ksp, mask)
  out = model.apply(variables, inp, ksp, mask)
  # add mode returns a plain tensor: pretrained + learnable
  assert out.shape == (1, 16, 16, 2)


def test_activation_and_norm_factories(rng):
  from csmri_refinement_tpu.models.layers import (get_activation,
                                                  make_norm_layer, PReLU,
                                                  InstanceNorm)
  x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
  assert float(get_activation('relu')(x).min()) >= 0
  lrelu = get_activation('lrelu', 0.2)
  np.testing.assert_allclose(np.asarray(lrelu(-jnp.ones(2))), -0.2,
                             rtol=1e-6)
  assert np.allclose(np.asarray(get_activation('tanh')(jnp.zeros(2))), 0)

  prelu = get_activation('prelu', 0.25)
  variables = prelu.init(jax.random.PRNGKey(0), x)
  np.testing.assert_allclose(np.asarray(variables['params']['slope']), 0.25)
  out = prelu.apply(variables, -jnp.ones((1, 2, 2, 3)))
  np.testing.assert_allclose(np.asarray(out), -0.25, rtol=1e-6)

  inorm = InstanceNorm(affine=True)
  variables = inorm.init(jax.random.PRNGKey(0), x)
  out = np.asarray(inorm.apply(variables, x))
  np.testing.assert_allclose(out.mean(axis=(1, 2)), 0.0, atol=1e-5)

  with pytest.raises(ValueError):
    make_norm_layer('group', True)
  with pytest.raises(ValueError):
    get_activation('swish')


def test_upsampling_golden_vs_torch(rng):
  torch = pytest.importorskip('torch')
  from csmri_refinement_tpu.models.unet import _nearest_up2, _bilinear_up2

  x = rng.randn(1, 4, 4, 2).astype(np.float32)
  tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

  want_nn = torch.nn.functional.interpolate(tx, scale_factor=2,
                                            mode='nearest')
  got_nn = _nearest_up2(jnp.asarray(x))
  np.testing.assert_allclose(np.asarray(got_nn),
                             want_nn.numpy().transpose(0, 2, 3, 1),
                             atol=1e-6)

  want_bi = torch.nn.functional.interpolate(tx, scale_factor=2,
                                            mode='bilinear',
                                            align_corners=False)
  got_bi = _bilinear_up2(jnp.asarray(x))
  np.testing.assert_allclose(np.asarray(got_bi),
                             want_bi.numpy().transpose(0, 2, 3, 1),
                             atol=1e-5)
