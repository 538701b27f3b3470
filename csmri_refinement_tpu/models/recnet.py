"""RecNet — deep cascade of CNNs with k-space data consistency.

Rebuild of /root/reference/models/recnet.py:65-161 (after Schlemper et al.,
"A Deep Cascade of Convolutional Neural Networks for Dynamic MR Image
Reconstruction") as a flax module on NHWC:

* each block = ``num_convs`` dilated SAME convs with LeakyReLU between
  (recnet.py:29-62), followed by a data-consistency step (recnet.py:150-151)
* optional residual add per block (``use_refinement``, recnet.py:147-148)
* optional skip of the final DC layer (recnet.py:129)
* optional intermediate reconstructions returned as a dict (recnet.py:155-159)
* init: first conv of each block xavier_uniform(gain=1), the rest
  he_normal(a=relu_leakiness) — reference ConvBlock.weight_init_params
  (recnet.py:54-59; layers[1] is the block's first conv)

TPU-first details: convs run in NHWC (XLA:TPU native layout); for deep
homogeneous cascades ``use_scan=True`` wraps the (block, DC) step in
``jax.lax.scan`` over stacked per-block parameters, bounding compile time at
any cascade depth. The DC step always computes in float32/complex64 even
under a bfloat16 compute dtype (k-space merges are precision-critical).
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from csmri_refinement_tpu.models import weight_inits
from csmri_refinement_tpu.models.layers import same_conv
from csmri_refinement_tpu.ops import dc as dc_ops

RECNET_REQUIRED_PARAMS = ['num_blocks', 'num_convs', 'num_filters']

RECNET_OPTIONAL_PARAMS = [
    'num_final_outputs', 'dilations_per_conv', 'kernel_size',
    'relu_leakiness', 'padding', 'use_refinement', 'skip_final_dc',
    'return_intermediate_recs', 'use_scan', 'dtype', 'dc_lines_acc',
]

DEFAULT_RELU_LEAKINESS = 0.01


def construct_model(conf, model_name, **kwargs):
  params = conf.to_param_dict(RECNET_REQUIRED_PARAMS, RECNET_OPTIONAL_PARAMS)
  user_init = weight_inits.normalize_user_init(
      conf.get_attr('weight_init', default={}))
  dtype = params.pop('dtype', None)
  if isinstance(dtype, str):
    dtype = jnp.dtype(dtype)
  if 'dc_lines_acc' not in params:
    # Runners thread the run's `undersampling` section into the model conf
    # (training/runner.py); a fixed-count Cartesian line mask enables the
    # exact skinny DC lowering (ops/dc.py).
    acc = dc_ops.lines_acc_from_undersampling(
        conf.get_attr('undersampling', default=None))
    if acc:
      params['dc_lines_acc'] = acc
  return RecNet(weight_init=user_init, dtype=dtype, **params)


class ConvBlock(nn.Module):
  """``num_convs`` same-padded convs; LeakyReLU after all but the last
  (reference recnet.py:29-62)."""
  num_convs: int
  num_filters: int
  kernel_size: int
  relu_leakiness: float
  dilations: Sequence[int]
  padding: str = 'zero'
  num_outputs: int = 2
  final_act: bool = False
  weight_init: Any = None
  dtype: Any = None

  @nn.compact
  def __call__(self, x):
    init_params = weight_inits.resolve_inits(
        {'conv_weight': ('he_normal', DEFAULT_RELU_LEAKINESS)},
        self.weight_init)
    conv_init, bias_init = weight_inits.kernel_and_bias(init_params, 'conv')
    # First conv of each block is xavier_uniform(1.0) unless the user
    # overrode conv_weight (reference recnet.py:58).
    if self.weight_init and 'conv_weight' in self.weight_init:
      first_init = conv_init
    else:
      first_init = weight_inits.get_initializer(('xavier', 1.0))

    k = self.kernel_size
    for i in range(self.num_convs - 1):
      d = self.dilations[i]
      conv = nn.Conv(self.num_filters, (k, k), strides=1, padding='VALID',
                     kernel_dilation=(d, d), use_bias=True,
                     kernel_init=first_init if i == 0 else conv_init,
                     bias_init=bias_init, dtype=self.dtype,
                     name='conv_{}'.format(i))
      x = same_conv(conv, x, k, self.padding, dilation=d)
      x = nn.leaky_relu(x, negative_slope=self.relu_leakiness)

    d = self.dilations[-1]
    conv = nn.Conv(self.num_outputs, (k, k), strides=1, padding='VALID',
                   kernel_dilation=(d, d), use_bias=True,
                   kernel_init=first_init if self.num_convs == 1
                   else conv_init,
                   bias_init=bias_init, dtype=self.dtype,
                   name='conv_{}'.format(self.num_convs - 1))
    x = same_conv(conv, x, k, self.padding, dilation=d)
    if self.final_act:
      x = nn.leaky_relu(x, negative_slope=self.relu_leakiness)
    return x


class RecNet(nn.Module):
  """Cascade of (ConvBlock → data consistency) on (B, H, W, 2) inputs.

  Forward contract matches the reference signature ``(inp, kspace, mask)``
  (recnet.py:139), bound by name from the batch dict.
  """
  num_blocks: int
  num_convs: int
  num_filters: Union[int, Sequence[int]]
  num_final_outputs: int = 2
  dilations_per_conv: Union[int, Sequence[int]] = 1
  kernel_size: int = 3
  relu_leakiness: float = DEFAULT_RELU_LEAKINESS
  padding: str = 'zero'
  use_refinement: bool = False
  skip_final_dc: bool = False
  return_intermediate_recs: bool = False
  use_scan: bool = False
  weight_init: Any = None
  dtype: Any = None
  #: Static acceleration divisor guaranteeing a fixed-count Cartesian line
  #: mask (threaded from the `undersampling` config) — enables the exact
  #: skinny DC lowering (ops/dc.py: ~1/16th the DC GEMM FLOPs).
  dc_lines_acc: Any = None
  #: Only consulted when ``dc_lines_acc`` is set: declares that ``inp`` is
  #: exactly the zero-filled reconstruction ifft2(kspace) — the invariant
  #: of the shipped data pipeline (training/prep.py, ops/undersample.py:92)
  #: — letting the skinny DC reuse it instead of recomputing F^-1 k0. Set
  #: False when feeding inputs that break the invariant.
  dc_zero_filled_input: bool = True

  INPUT_KEYS = ('inp', 'kspace', 'mask')

  def _skinny_ctx(self, inp, kspace, mask):
    """Sampled-lines DC context, or None when not statically safe."""
    if not self.dc_lines_acc or not dc_ops.skinny_supported():
      return None
    h = kspace.shape[-3]
    k = dc_ops.skinny_num_lines(h, self.dc_lines_acc)
    if k <= 0 or k >= h:
      return None
    x0 = inp if self.dc_zero_filled_input else None
    return dc_ops.skinny_dc_context(kspace, mask, k, x0=x0)

  def _block_config(self):
    num_filters = self.num_filters
    if isinstance(num_filters, int):
      num_filters = [num_filters] * self.num_blocks
    dilations = self.dilations_per_conv
    if isinstance(dilations, int):
      dilations = [dilations] * self.num_convs
    assert len(num_filters) == self.num_blocks, \
        'Number of given filters must match number of blocks'
    assert len(dilations) == self.num_convs, \
        'Number of dilations must match number of convolutions'
    return list(num_filters), tuple(dilations)

  @nn.compact
  def __call__(self, inp, kspace, mask):
    num_filters, dilations = self._block_config()
    num_dc_layers = self.num_blocks - (1 if self.skip_final_dc else 0)

    homogeneous = (len(set(num_filters)) == 1 and
                   self.num_final_outputs == 2 and
                   not self.skip_final_dc and
                   not self.return_intermediate_recs)
    if self.use_scan and homogeneous:
      return self._forward_scan(inp, kspace, mask, num_filters[0], dilations)

    x = inp
    skinny_ctx = self._skinny_ctx(inp, kspace, mask)
    reconstructions = []
    for idx in range(self.num_blocks):
      block_input = x
      num_outputs = 2 if idx < self.num_blocks - 1 else self.num_final_outputs
      x = ConvBlock(self.num_convs, num_filters[idx], self.kernel_size,
                    self.relu_leakiness, dilations, padding=self.padding,
                    num_outputs=num_outputs, weight_init=self.weight_init,
                    dtype=self.dtype, name='block_{}'.format(idx))(x)
      if self.use_refinement:
        x = x + block_input
      if idx < num_dc_layers:
        # DC is precision-critical: always merge in float32 k-space.
        x = dc_ops.data_consistency(
            x.astype(jnp.float32), kspace, mask,
            skinny_ctx=skinny_ctx).astype(x.dtype)
        if self.return_intermediate_recs:
          reconstructions.append(x)

    if self.return_intermediate_recs:
      return {'pred': x, 'reconstructions': reconstructions}
    return x

  def _forward_scan(self, inp, kspace, mask, num_filters, dilations):
    """lax.scan over stacked per-block params — compile time O(1) in depth."""
    skinny_ctx = self._skinny_ctx(inp, kspace, mask)

    class Step(nn.Module):
      outer: RecNet
      num_filters: int
      dilations: Sequence[int]

      @nn.compact
      def __call__(self, carry, _):
        x, kspace, mask = carry
        y = ConvBlock(self.outer.num_convs, self.num_filters,
                      self.outer.kernel_size, self.outer.relu_leakiness,
                      self.dilations, padding=self.outer.padding,
                      num_outputs=2, weight_init=self.outer.weight_init,
                      dtype=self.outer.dtype, name='block')(x)
        if self.outer.use_refinement:
          y = y + x
        # skinny_ctx rides as a scan-invariant closure capture (shared
        # across every cascade's DC, computed once outside the scan).
        y = dc_ops.data_consistency(
            y.astype(jnp.float32), kspace, mask,
            skinny_ctx=skinny_ctx).astype(y.dtype)
        return (y, kspace, mask), ()

    scan = nn.scan(Step, variable_axes={'params': 0},
                   split_rngs={'params': True}, length=self.num_blocks)
    (x, _, _), _ = scan(self, num_filters, dilations,
                        name='blocks')((inp, kspace, mask), None)
    return x
