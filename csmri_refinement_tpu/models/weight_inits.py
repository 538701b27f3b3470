"""Declarative weight-init system.

Rebuild of /root/reference/models/weight_inits.py:5-114 for flax: init specs
are (name, *args) tuples resolved into jax initializer functions, with the
same three-level precedence — framework defaults, model-provided overrides,
user-config overrides (reference initialize_weights at weight_inits.py:109-114).

Since flax parameters are created at module construction (not mutated after
the fact like torch's model.apply), models resolve their spec dict up front
and pass concrete ``kernel_init``/``bias_init`` functions into each layer.

Spec names and semantics match the reference's torch.nn.init mapping
(weight_inits.py:17-66):

* ``('constant', c)``, ``'zero'``
* ``('normal', mean, std)``
* ``('uniform', a, b)``
* ``('xavier', gain_or_name)`` / ``('xavier_normal', gain_or_name)``
* ``('he_normal', a)`` / ``('he_uniform', a)`` — a = rectifier negative slope
* ``('orthogonal', gain_or_name[, param])``
* ``'torch_default'`` — keep flax's default (lecun_normal)
"""

import math

import jax
import jax.numpy as jnp
from jax.nn import initializers as init

DEFAULT_INITS = {
    'conv_weight': ('he_normal', 0.0),
    'conv_bias': ('constant', 0.0),
    'conv_transposed_weight': ('he_normal', 0.0),
    'conv_transposed_bias': ('constant', 0.0),
    'batchnorm_weight': ('constant', 1.0),
    'batchnorm_bias': ('constant', 0.0),
    'linear_weight': ('xavier_normal', 'linear'),
    'linear_bias': ('constant', 0.0),
}


def calculate_gain(nonlinearity, param=None):
  """torch.nn.init.calculate_gain equivalents for the names used here."""
  if nonlinearity == 'linear':
    return 1.0
  if nonlinearity == 'relu':
    return math.sqrt(2.0)
  if nonlinearity == 'leaky_relu':
    slope = 0.01 if param is None else param
    return math.sqrt(2.0 / (1 + slope ** 2))
  if nonlinearity == 'tanh':
    return 5.0 / 3
  raise ValueError('Unknown nonlinearity {}'.format(nonlinearity))


def get_initializer(spec):
  """Resolve an init spec to a jax initializer fn(key, shape, dtype).

  Initializers computed with variance_scaling use fan values derived from
  the kernel shape; for flax NHWC conv kernels (kh, kw, in, out) this matches
  torch's fan computation on (out, in, kh, kw).
  """
  name = spec[0] if isinstance(spec, (tuple, list)) else spec

  if name == 'torch_default':
    return None  # caller keeps the layer's default

  if name == 'zero':
    return init.zeros

  if name == 'constant':
    value = spec[1]
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, value, dtype)

  if name == 'normal':
    assert len(spec) == 3, 'Need mean and std for normal init'
    mean, std = spec[1], spec[2]
    def normal_init(key, shape, dtype=jnp.float32):
      return mean + std * jax.random.normal(key, shape, dtype)
    return normal_init

  if name == 'uniform':
    assert len(spec) == 3, 'Need lower and upper value for uniform init'
    a, b = spec[1], spec[2]
    def uniform_init(key, shape, dtype=jnp.float32):
      return jax.random.uniform(key, shape, dtype, minval=a, maxval=b)
    return uniform_init

  if name.startswith('xavier'):
    assert isinstance(spec, (tuple, list)), 'Need gain value for Xavier init'
    gain = spec[1]
    if isinstance(gain, str):
      gain = calculate_gain(gain)
    # torch xavier: std = gain * sqrt(2 / (fan_in + fan_out))
    distribution = 'normal' if name == 'xavier_normal' else 'uniform'
    return init.variance_scaling(gain ** 2, 'fan_avg', distribution)

  if name.startswith('he'):
    a = spec[1] if isinstance(spec, (tuple, list)) else 0.0
    # torch kaiming: gain = sqrt(2 / (1 + a^2)), std = gain / sqrt(fan_in)
    scale = 2.0 / (1 + a ** 2)
    distribution = 'normal' if name == 'he_normal' else 'uniform'
    return init.variance_scaling(scale, 'fan_in', distribution)

  if name == 'orthogonal':
    gain = spec[1] if isinstance(spec, (tuple, list)) else 1.0
    if isinstance(gain, str):
      param = spec[2] if len(spec) > 2 else None
      gain = calculate_gain(gain, param)
    return init.orthogonal(scale=gain, column_axis=-1)

  raise ValueError('Unknown weight init {}'.format(name))


def resolve_inits(model_defaults=None, user_overrides=None):
  """Merge framework defaults ← model defaults ← user config
  (reference initialize_weights, weight_inits.py:109-114)."""
  params = dict(DEFAULT_INITS)
  if model_defaults:
    params.update(model_defaults)
  if user_overrides:
    params.update(user_overrides)
  return params


def kernel_and_bias(init_params, kind):
  """Concrete (kernel_init, bias_init) for a layer kind
  ('conv', 'conv_transposed', 'linear', 'batchnorm')."""
  w_spec = init_params.get(kind + '_weight')
  b_spec = init_params.get(kind + '_bias', ('constant', 0.0))
  kernel_init = get_initializer(w_spec) if w_spec is not None else None
  bias_init = get_initializer(b_spec) if b_spec is not None else None
  if kernel_init is None:
    kernel_init = init.lecun_normal()
  if bias_init is None:
    bias_init = init.zeros
  return kernel_init, bias_init


def normalize_user_init(user_weight_init):
  """Accept JSON-config init lists (e.g. ["orthogonal", "relu"]) as tuples."""
  if not user_weight_init:
    return {}
  out = {}
  for key, spec in user_weight_init.items():
    out[key] = tuple(spec) if isinstance(spec, list) else spec
  return out
