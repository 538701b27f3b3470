"""Optimizer factory (optax).

Rebuild of /root/reference/training/optimizers.py:5-24: Adam with
configurable betas, RMSProp with alpha. Optimizers are wrapped in
``optax.inject_hyperparams`` so the per-epoch LR schedulers
(:mod:`csmri_refinement_tpu.training.lr_schedulers`) can assign the learning
rate directly into the optimizer state between epochs — the functional
analogue of torch schedulers mutating param groups.
"""

import optax


def get_optimizer(conf, optimizer_name):
  """Returns (optax transform, initial learning rate)."""
  lr = conf.learning_rate
  if optimizer_name == 'Adam':
    beta1 = conf.get_attr('beta1', default=0.9)
    beta2 = conf.get_attr('beta2', default=0.999)
    tx = optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=beta1, b2=beta2, eps=1e-8)
  elif optimizer_name == 'RMSProp':
    alpha = conf.get_attr('alpha', default=0.99)
    tx = optax.inject_hyperparams(optax.rmsprop)(
        learning_rate=lr, decay=alpha, eps=1e-8)
  else:
    raise ValueError('Unknown optimizer {}'.format(optimizer_name))
  return tx, lr


def set_learning_rate(opt_state, lr):
  """Assign a new LR into an inject_hyperparams optimizer state."""
  opt_state.hyperparams['learning_rate'] = lr
  return opt_state


def get_learning_rate(opt_state):
  return float(opt_state.hyperparams['learning_rate'])
