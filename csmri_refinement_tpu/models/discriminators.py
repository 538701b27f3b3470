"""CNN discriminator (PatchGAN / FC head).

Rebuild of /root/reference/models/discriminators.py:50-247 on NHWC:

* conv stack with per-layer filters/kernels/strides, SAME padding modes,
  batch/instance norm with the ``not-first`` option (discriminators.py:140-143),
  lrelu/prelu/relu, channelwise dropout after selected layers
  (discriminators.py:149-150 — torch Dropout2d semantics)
* head: FC layers (spatial shape inferred at trace time — no dry forward
  pass needed, unlike discriminators.py:180-187) or a PatchGAN
  ``final_conv_kernel_size`` conv without padding, optionally followed by
  global average pooling (discriminators.py:170-178)
* outputs dict ``{prob, logits[, features]}`` where features are the
  post-activation maps feeding the feature-matching loss
  (discriminators.py:146-147, 211-228)
* default init: conv/linear normal(0, 0.02), BN weight normal(1, 0.02)
  (discriminators.py:189-207)
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from csmri_refinement_tpu.models import weight_inits
from csmri_refinement_tpu.models.layers import (InstanceNorm, need_bias,
                                                same_conv)

REQUIRED_PARAMS = ['num_inputs', 'num_filters_per_layer', 'strides']

OPTIONAL_PARAMS = [
    'kernel_sizes', 'fc_layers', 'spatial_shape', 'act_fn',
    'relu_leakiness', 'use_norm_layers', 'norm_layer', 'padding',
    'final_conv_kernel_size', 'final_average_pooling', 'use_biases',
    'compute_features', 'dropout_after', 'dropout_prob', 'dtype',
]

DEFAULT_RELU_LEAKINESS = 0.2


def construct_model(conf, model_name, **kwargs):
  if model_name != 'CNNDiscriminator':
    raise ValueError('Unknown discriminator {}'.format(model_name))
  params = conf.to_param_dict(REQUIRED_PARAMS, OPTIONAL_PARAMS)
  params.pop('spatial_shape', None)  # inferred at trace time
  user_init = weight_inits.normalize_user_init(
      conf.get_attr('weight_init', default={}))
  dtype = params.pop('dtype', None)
  if isinstance(dtype, str):
    dtype = jnp.dtype(dtype)
  return CNNDiscriminator(weight_init=user_init, dtype=dtype, **params)


class CNNDiscriminator(nn.Module):
  num_inputs: int
  num_filters_per_layer: Sequence[int]
  strides: Sequence[int]
  kernel_sizes: Union[int, Sequence[int], None] = None
  fc_layers: Sequence[int] = ()
  act_fn: str = 'lrelu'
  relu_leakiness: float = DEFAULT_RELU_LEAKINESS
  use_norm_layers: Union[bool, str] = True
  norm_layer: str = 'batch'
  padding: str = 'zero'
  final_conv_kernel_size: int = 1
  final_average_pooling: bool = False
  use_biases: bool = True
  compute_features: bool = False
  dropout_after: Sequence[int] = ()
  dropout_prob: float = 0.5
  weight_init: Any = None
  dtype: Any = None

  INPUT_KEYS = ('inp',)
  HAS_TRAIN_ARG = True

  def _activation(self, x, idx):
    if self.act_fn == 'relu':
      return nn.relu(x)
    if self.act_fn == 'lrelu':
      return nn.leaky_relu(x, negative_slope=self.relu_leakiness)
    if self.act_fn == 'prelu':
      from csmri_refinement_tpu.models.layers import PReLU
      return PReLU(init_slope=self.relu_leakiness,
                   name='prelu_{}'.format(idx))(x)
    raise ValueError('Unknown activation {}'.format(self.act_fn))

  @nn.compact
  def __call__(self, inp, train=False):
    kernel_sizes = self.kernel_sizes
    if kernel_sizes is None:
      kernel_sizes = 3
    if isinstance(kernel_sizes, int):
      kernel_sizes = [kernel_sizes] * len(self.num_filters_per_layer)
    assert len(self.num_filters_per_layer) == len(self.strides)
    assert len(self.num_filters_per_layer) == len(kernel_sizes)

    init_params = weight_inits.resolve_inits(
        {'conv_weight': ('normal', 0.0, 0.02),
         'linear_weight': ('normal', 0.0, 0.02),
         'batchnorm_weight': ('normal', 1.0, 0.02)},
        self.weight_init)
    conv_init, bias_init = weight_inits.kernel_and_bias(init_params, 'conv')
    linear_init, linear_bias_init = weight_inits.kernel_and_bias(
        init_params, 'linear')
    bn_init = weight_inits.get_initializer(init_params['batchnorm_weight'])
    # final_layer_bias user override (reference weight_init_params,
    # discriminators.py:196-207)
    final_bias_init = bias_init
    if self.weight_init and 'final_layer_bias' in self.weight_init:
      final_bias_init = weight_inits.get_initializer(
          tuple(self.weight_init['final_layer_bias'])
          if isinstance(self.weight_init['final_layer_bias'], list)
          else self.weight_init['final_layer_bias'])

    x = inp
    features = []
    use_norm = self.use_norm_layers
    for idx, (num_filters, k, stride) in enumerate(
        zip(self.num_filters_per_layer, kernel_sizes, self.strides)):
      use_bias = self.use_biases and need_bias(use_norm, self.norm_layer)
      conv = nn.Conv(num_filters, (k, k), strides=(stride, stride),
                     padding='VALID', use_bias=use_bias,
                     kernel_init=conv_init, bias_init=bias_init,
                     dtype=self.dtype, name='conv_{}'.format(idx))
      x = same_conv(conv, x, k, self.padding, stride=stride)
      if use_norm != 'not-first' and use_norm:
        if self.norm_layer == 'batch':
          x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, scale_init=bn_init,
                           dtype=self.dtype, name='norm_{}'.format(idx))(x)
        elif self.norm_layer == 'instance':
          x = InstanceNorm(affine=False, name='norm_{}'.format(idx))(x)
        elif self.norm_layer == 'instance-affine':
          x = InstanceNorm(affine=True, name='norm_{}'.format(idx))(x)
        else:
          raise ValueError(
              'Unknown normalization layer {}'.format(self.norm_layer))
      elif use_norm == 'not-first':
        use_norm = True
      x = self._activation(x, idx)

      if self.compute_features:
        features.append(x)

      if idx in self.dropout_after:
        # torch Dropout2d: drop whole channels
        x = nn.Dropout(rate=self.dropout_prob, broadcast_dims=(1, 2),
                       deterministic=not train,
                       name='dropout_{}'.format(idx))(x)

    if len(self.fc_layers) > 0:
      x = x.reshape(x.shape[0], -1)
      for fc_idx, num_features in enumerate(self.fc_layers[:-1]):
        x = nn.Dense(num_features, use_bias=self.use_biases,
                     kernel_init=linear_init, bias_init=linear_bias_init,
                     dtype=self.dtype, name='fc_{}'.format(fc_idx))(x)
        x = self._activation(x, 'fc_{}'.format(fc_idx))
        if self.compute_features:
          features.append(x)
      x = nn.Dense(self.fc_layers[-1], use_bias=True,
                   kernel_init=linear_init, bias_init=final_bias_init,
                   dtype=self.dtype,
                   name='fc_{}'.format(len(self.fc_layers) - 1))(x)
      if self.compute_features:
        features.append(x)
    else:
      # PatchGAN head: final conv without padding (discriminators.py:172-174)
      x = nn.Conv(1, (self.final_conv_kernel_size,
                      self.final_conv_kernel_size),
                  strides=1, padding='VALID', use_bias=self.use_biases,
                  kernel_init=conv_init, bias_init=final_bias_init,
                  dtype=self.dtype, name='final_conv')(x)
      if self.final_average_pooling:
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
      if self.compute_features:
        features.append(x)

    out = {'prob': nn.sigmoid(x), 'logits': x}
    if self.compute_features:
      out['features'] = features
    return out
