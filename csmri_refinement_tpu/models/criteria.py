"""Criterion registry and wrappers.

Rebuild of /root/reference/models/criteria.py:50-128. Criteria are pure
functions ``(model_output, batch) → scalar loss``, jit-safe, so a runner can
assemble its weighted total loss inside a single compiled step. Wrappers
select the prediction key from dict outputs and the target key from the
batch (CriterionWrapper, criteria.py:69-83); FeaturePenalty regularizes a
named model output toward a constant (CriterionWrapperWithScalarTarget,
criteria.py:86-109).

Adversarial criteria don't follow the (prediction, target) structure and are
built by :mod:`csmri_refinement_tpu.models.adversarial_loss`
(criteria.py:8-13).
"""

import jax.numpy as jnp
import optax


def mse_loss(pred, target):
  return jnp.mean((pred - target) ** 2)


def l1_loss(pred, target):
  return jnp.mean(jnp.abs(pred - target))


def smooth_l1_loss(pred, target):
  """Huber with delta=1 (torch SmoothL1Loss)."""
  return jnp.mean(optax.huber_loss(pred, target, delta=1.0))


def cross_entropy_loss(logits, labels):
  """Dense CE over NHWC logits and (B, H, W) integer labels
  (torch nn.CrossEntropyLoss on NCHW)."""
  return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
      logits, labels.astype(jnp.int32)))


def nll_loss(log_probs, labels):
  """NLL over NHWC log-probabilities (torch nn.NLLLoss2d)."""
  labels = labels.astype(jnp.int32)
  picked = jnp.take_along_axis(log_probs, labels[..., None], axis=-1)
  return -jnp.mean(picked)


_SIMPLE_CRITERIA = {
    'MSE': mse_loss,
    'L1': l1_loss,
    'SmoothL1Loss': smooth_l1_loss,
    'CrossEntropy': cross_entropy_loss,
    'NLLLoss': nll_loss,
}

_ADVERSARIAL = ('GAN', 'LSGAN', 'WGAN', 'FeatureMatching',
                'gan', 'lsgan', 'wgan', 'feature-matching')


class CriterionWrapper:
  """Select pred/target keys, then apply the base criterion."""

  def __init__(self, criterion, target_key='target', input_key='pred'):
    self.criterion = criterion
    self.target_key = target_key
    self.input_key = input_key

  def __call__(self, out_model, batch):
    prediction = out_model[self.input_key] \
        if isinstance(out_model, dict) else out_model
    return self.criterion(prediction, batch[self.target_key])


class CriterionWrapperWithScalarTarget(CriterionWrapper):
  """Regularize a named model output toward a scalar constant."""

  def __init__(self, criterion, scalar_target, input_key='pred'):
    super().__init__(criterion, input_key=input_key)
    self.scalar_target = scalar_target

  def __call__(self, out_model, batch):
    prediction = out_model[self.input_key] \
        if isinstance(out_model, dict) else out_model
    target = jnp.full_like(prediction, self.scalar_target)
    return self.criterion(prediction, target)


def _get_feature_penalty_criterion(conf, loss_name, target_key):
  assert conf.has_attr('feature_penalty'), \
      ('Feature penalty loss needs additional config under key '
       '"feature_penalty"')
  assert 'input_key' in conf.feature_penalty, \
      ('Feature penalty loss needs input key specifying which model output '
       'to apply the penalty to under key "input_key"')
  input_key = conf.feature_penalty['input_key']
  criterion_name = conf.feature_penalty.get('criterion', 'MSE')
  assert criterion_name in _SIMPLE_CRITERIA, \
      'Unknown criterion {} for feature penalty loss'.format(criterion_name)
  return CriterionWrapperWithScalarTarget(
      _SIMPLE_CRITERIA[criterion_name], scalar_target=0.0,
      input_key=input_key)


def _get_vgg_criterion(conf, loss_name, target_key, train=True):
  from csmri_refinement_tpu.models.vgg_loss import VGGLoss
  if conf.has_attr('vgg_loss'):
    blocks = conf.vgg_loss.get('blocks', -1)
    criterion = conf.vgg_loss.get('criterion', 'MSE')
    weights = conf.vgg_loss.get('weights')
    dtype = conf.vgg_loss.get('dtype')
  else:
    blocks, criterion, weights, dtype = -1, 'MSE', None, None
  if dtype is None and train:
    # Mixed-precision training: the run-level train_dtype also sets the
    # VGG feature extractor's compute dtype (explicit vgg_loss.dtype
    # wins). Train-only by contract: eval ignores train_dtype
    # (docs/CONFIG.md) — the ``train`` flag enforces that here rather
    # than relying on the runners building criteria only in train mode.
    dtype = conf.get_attr('train_dtype')
  vgg_loss = VGGLoss(loss_name, blocks, criterion, weights,
                     weights_path=conf.get_attr('vgg_weights_path'),
                     conf_path=conf.file,
                     allow_random_init=conf.get_attr('vgg_random_init',
                                                     default=False),
                     remat=conf.get_attr('train_remat', default=False),
                     dtype=dtype)
  return CriterionWrapper(vgg_loss, target_key)


def get_criterion(conf, loss_name, target_key=None, input_key=None,
                  loss_type=None, train=True):
  """Criterion factory (reference criteria.py:112-128).

  ``loss_type`` ('gen'/'disc') selects adversarial loss direction.
  Per-loss target-key remapping honors the ``loss_target_keys`` config
  (criteria.py:118-121). ``train=False`` builds an evaluation criterion
  that ignores the run-level ``train_dtype`` (only VGG19 is affected —
  the other criteria are dtype-free reductions).
  """
  if input_key is None:
    input_key = 'pred'
  if target_key is None:
    target_key = conf.get_attr('loss_target_keys', default={}).get(
        loss_name, 'target')

  if loss_name in _SIMPLE_CRITERIA:
    return CriterionWrapper(_SIMPLE_CRITERIA[loss_name], target_key,
                            input_key)
  if loss_name in _ADVERSARIAL:
    from csmri_refinement_tpu.models.adversarial_loss import (
        get_adversarial_loss)
    return get_adversarial_loss(conf, loss_name, loss_type)
  if loss_name == 'VGG19':
    return _get_vgg_criterion(conf, loss_name, target_key, train=train)
  if loss_name == 'FeaturePenalty':
    return _get_feature_penalty_criterion(conf, loss_name, target_key)
  raise ValueError('Unknown loss {}'.format(loss_name))
