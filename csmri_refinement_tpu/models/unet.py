"""Configurable U-Net.

Rebuild of /root/reference/models/unet.py:37-290 on NHWC:

* encode path: per-scale ConvEncodeUnit (convs + BN + LeakyReLU, max-pool
  downsample except last scale) (unet.py:37-67)
* decode path: ConvDecodeUnit with six upsampling modes — ``transposed``,
  ``nn``, ``bilinear``, ``pixelshuffle``, ``nn-resize-conv``,
  ``nn-biresize-conv`` (unet.py:77-102) — skip-concat with pad-to-target
  (unet.py:27-34,131-136), then plain decode units once encoder scales are
  exhausted (unet.py:227-238)
* ``decoder_act_upsampling_only``: BN+act on the upsample path only
  (unet.py:106-120)
* output head: 1×1 conv + softmax/tanh/none (unet.py:240-246); optional
  residual ``use_refinement`` add (unet.py:280-281); optional indexed
  encoder feature maps returned as dict (unet.py:283-288)
* default init he_normal(0.1) for conv/transposed-conv, BN weight
  uniform(0.98, 1.02) (unet.py:253-259)
"""

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from csmri_refinement_tpu.models import weight_inits
from csmri_refinement_tpu.models.layers import same_conv, same_pad

REQUIRED_PARAMS = [
    'num_inputs', 'num_outputs', 'num_layers_per_scale',
    'encode_filters', 'decode_filters', 'output_activation',
]

OPTIONAL_PARAMS = [
    'kernel_size', 'transposed_kernel_size', 'relu_leakiness', 'use_bn',
    'upsampling_mode', 'padding', 'encoder_features', 'use_refinement',
    'decoder_act_upsampling_only', 'dtype', 'remat', 'fused_inference',
    'quantize_inference',
]

DEFAULT_RELU_LEAKINESS = 0.1

UPSAMPLING_MODES = ('transposed', 'nn', 'bilinear', 'pixelshuffle',
                    'nn-resize-conv', 'nn-biresize-conv')


def construct_model(conf, model_name, **kwargs):
  params = conf.to_param_dict(REQUIRED_PARAMS, OPTIONAL_PARAMS)
  user_init = weight_inits.normalize_user_init(
      conf.get_attr('weight_init', default={}))
  dtype = params.pop('dtype', None)
  if isinstance(dtype, str):
    dtype = jnp.dtype(dtype)
  return UNET(weight_init=user_init, dtype=dtype, **params)


def _pad_to_target(x, target, mode='reflect'):
  """Pad bottom/right so x's spatial dims match target's (unet.py:27-34)."""
  pad_bottom = target.shape[1] - x.shape[1]
  pad_right = target.shape[2] - x.shape[2]
  if pad_bottom != 0 or pad_right != 0:
    x = jnp.pad(x, [(0, 0), (0, pad_bottom), (0, pad_right), (0, 0)],
                mode=mode)
  return x


def _nearest_up2(x):
  return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _bilinear_up2(x):
  b, h, w, c = x.shape
  return jax.image.resize(x, (b, 2 * h, 2 * w, c), method='bilinear')


def _pixel_shuffle(x, r=2):
  """(B, H, W, r²·C) → (B, rH, rW, C), torch PixelShuffle channel order
  (output channel c reads input channels [c·r², (c+1)·r²) row-major)."""
  b, h, w, c4 = x.shape
  c = c4 // (r * r)
  x = x.reshape(b, h, w, c, r, r)
  x = x.transpose(0, 1, 4, 2, 5, 3)
  return x.reshape(b, h * r, w * r, c)


class SubpixelNNResizeConv(nn.Module):
  """``nearest-up2 → SAME k×k conv`` computed without materializing the
  upsampled image.

  Because nearest upsampling duplicates pixels, the k=4 conv on the 2×-
  upsampled grid collapses to four phase kernels of size 3×3 on the
  low-resolution grid (adjacent taps that read the same source pixel sum):
  one conv producing 4·C_out channels followed by depth-to-space. This is
  0.56× the FLOPs and packs 4× more output channels onto the MXU lanes —
  measured ~2.8× on the flagship's decode upsample convs (NOTES.md) — and
  skips the 2×-upsampled intermediate entirely.

  Boundary semantics match the reference exactly (nearest-up then SAME pad
  of the *upsampled* image, reference unet.py:98-102 + utils.py:58-85):
  zero/replicate pads are exact by construction; reflect padding reaches
  one extra source pixel at the bottom/right edge, so the last output
  row/column is recomputed exactly from thin upsampled slabs.

  Parameter layout is identical to the plain conv (kernel (k,k,Cin,Cout) +
  bias), so checkpoints and the torch importer are unaffected.
  """
  num_filters: int
  kernel_size: int  # must be 4
  use_bias: bool
  padding: str
  conv_init: Any = None
  bias_init: Any = None
  dtype: Any = None

  @nn.compact
  def __call__(self, x):
    assert self.kernel_size == 4, 'subpixel fast path is k=4 only'
    k, cin, cout = self.kernel_size, x.shape[-1], self.num_filters
    conv_init = self.conv_init or nn.initializers.lecun_normal()
    kernel = self.param('kernel', conv_init, (k, k, cin, cout))
    bias = self.param('bias', self.bias_init or nn.initializers.zeros,
                      (cout,)) if self.use_bias else None

    dt = self.dtype or x.dtype
    kern = kernel.astype(dt)
    # Per-axis tap-collapse matrices: output phase r∈{0,1} at low-res i
    # reads source offsets floor((r-1+t)/2) for tap t (pads p1=1, p2=2).
    a0 = jnp.asarray([[1, 0, 0, 0], [0, 1, 1, 0], [0, 0, 0, 1]], dt)
    a1 = jnp.asarray([[0, 0, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1]], dt)
    phases = []
    for ay in (a0, a1):
      for ax in (a0, a1):
        phases.append(jnp.einsum('at,bu,tuio->abio', ay, ax, kern))
    # (3,3,cin,4·cout); channel blocks ordered (ry,rx) row-major
    ksub = jnp.concatenate(phases, axis=-1)

    lowpad = 'zero' if self.padding == 'zero' else 'replication'
    xp = same_pad(x.astype(dt), 3, 1, lowpad)
    y4 = jax.lax.conv_general_dilated(
        xp, ksub, (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    b, h, w, _ = y4.shape
    # depth-to-space: phase (ry,rx) block → output pixel (2i+ry, 2j+rx)
    y = y4.reshape(b, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5) \
          .reshape(b, 2 * h, 2 * w, cout)

    if self.padding == 'reflection':
      # Reflect on the upsampled grid reaches one extra source pixel at
      # the bottom/right: recompute the last output row/col exactly from
      # thin nearest-upsampled slabs (padded within the slab, which holds
      # every row/col the reflection can reach).
      def strip_conv(slab):
        return jax.lax.conv_general_dilated(
            slab, kern, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

      row = _nearest_up2(x[:, -2:]).astype(dt)            # u rows 2H-4..2H-1
      row = jnp.pad(row, [(0, 0), (0, 2), (1, 2), (0, 0)], mode='reflect')
      last_row = strip_conv(row)[:, 2:3]                  # output row 2H-1
      col = _nearest_up2(x[:, :, -2:]).astype(dt)
      col = jnp.pad(col, [(0, 0), (1, 2), (0, 2), (0, 0)], mode='reflect')
      last_col = strip_conv(col)[:, :, 2:3]               # output col 2W-1
      y = y.at[:, -1:, :].set(last_row)
      y = y.at[:, :, -1:].set(last_col)

    if bias is not None:
      y = y + bias.astype(dt)
    return y


# Lower the skip-merge conv as conv_a(enc) + conv_b(dec) instead of
# conv(concat([enc, dec])): exact by linearity in input channels. Wins big
# in ISOLATION (6.2 → 4.5 ms for d1 64→32 @256 B128, 5.1 → 2.5 ms for d0
# 128→64 @128 on v5e — the concat materialization dominates there), but
# LOSES ~5% end-to-end in the composed flagship graph (2195 → 2089
# slices/s): XLA already fuses the concat into the consuming conv inside
# the full program, and the split doubles conv launches + reflect border
# fixups. Default off; kept (with equivalence tests) as a measured
# negative result and for backends without that fusion.
_SPLIT_MERGE_CONV = False


class _SplitSumConv(nn.Module):
  """First decode conv on an unmaterialized (encode, decode) pair.

  Parameter layout is identical to the nn.Conv it replaces (child name and
  'kernel'/'bias' param names supplied by the caller), so checkpoints and
  the torch importer are unaffected: kernel (k, k, c_enc + c_dec, cout),
  input-channel blocks ordered [encode, decode] like the concat it lowers.
  """
  num_filters: int
  kernel_size: int
  use_bias: bool
  padding: str
  conv_init: Any = None
  bias_init: Any = None
  dtype: Any = None

  @nn.compact
  def __call__(self, enc, dec):
    k = self.kernel_size
    cin = enc.shape[-1] + dec.shape[-1]
    kernel = self.param('kernel',
                        self.conv_init or nn.initializers.lecun_normal(),
                        (k, k, cin, self.num_filters))
    bias = self.param('bias', self.bias_init or nn.initializers.zeros,
                      (self.num_filters,)) if self.use_bias else None

    dt = self.dtype or dec.dtype
    kern = kernel.astype(dt)
    ce = enc.shape[-1]

    def half(x, kern_half):
      conv = lambda p: jax.lax.conv_general_dilated(
          p, kern_half, (1, 1), 'VALID',
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
      return same_conv(conv, x.astype(dt), k, self.padding)

    y = half(enc, kern[:, :, :ce]) + half(dec, kern[:, :, ce:])
    if bias is not None:
      y = y + bias.astype(dt)
    return y


class _ConvParams(nn.Module):
  """Declares nn.Conv's parameter tree (kernel/bias) without running the
  conv — the fused-inference path reads the weights and feeds them to the
  Pallas chain kernel. Same child name + param names + initializers as the
  nn.Conv it mirrors, so the variable tree (checkpoints, torch importer,
  init RNG folding) is bit-identical."""
  shape: Tuple[int, ...]          # (k, k, cin, cout)
  use_bias: bool
  kernel_init: Any
  bias_init: Any

  @nn.compact
  def __call__(self):
    kernel = self.param('kernel',
                        self.kernel_init or nn.initializers.lecun_normal(),
                        self.shape)
    bias = None
    if self.use_bias:
      bias = self.param('bias', self.bias_init or nn.initializers.zeros,
                        (self.shape[-1],))
    return kernel, bias


class _BNParams(nn.Module):
  """Declares nn.BatchNorm's eval-mode variable tree (scale/bias params +
  running stats) without running it, for BN folding on the fused path."""
  features: int
  scale_init: Any

  @nn.compact
  def __call__(self):
    scale = self.param('scale', self.scale_init or nn.initializers.ones,
                       (self.features,))
    bias = self.param('bias', nn.initializers.zeros, (self.features,))
    mean = self.variable('batch_stats', 'mean',
                         lambda s: jnp.zeros(s, jnp.float32),
                         (self.features,))
    var = self.variable('batch_stats', 'var',
                        lambda s: jnp.ones(s, jnp.float32),
                        (self.features,))
    return scale, bias, mean.value, var.value


class ConvEncodeUnit(nn.Module):
  in_channels: int  # informational; flax infers
  num_layers: int
  num_filters: int
  kernel_size: int
  relu_leakiness: float
  use_bn: bool
  downsample: bool
  use_act: bool = True
  padding: str = 'zero'
  conv_init: Any = None
  bias_init: Any = None
  bn_init: Any = None
  dtype: Any = None
  fused_inference: bool = False
  quantize_inference: bool = False

  def _fused_chain(self, x):
    """Eval-mode conv chain through the fused Pallas kernel.

    BN (running stats) folds into per-channel weight scale + bias; layers
    the kernel cannot pack efficiently (Cin < 32) run as plain XLA convs
    with the same folded weights (ops/conv_pallas.chain_forward)."""
    from csmri_refinement_tpu.ops import conv_pallas

    use_bias = not self.use_bn
    dt = self.dtype or x.dtype
    x = x.astype(dt)
    k = self.kernel_size
    chain = []
    cin = x.shape[-1]
    for i in range(self.num_layers):
      kernel, bias = _ConvParams(
          (k, k, cin, self.num_filters), use_bias, self.conv_init,
          self.bias_init, name='conv_{}'.format(i))()
      kernel = kernel.astype(jnp.float32)
      bias = None if bias is None else bias.astype(jnp.float32)
      if self.use_bn:
        scale, b_bn, mean, var = _BNParams(
            self.num_filters, self.bn_init, name='bn_{}'.format(i))()
        s = scale.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-5)
        kernel = kernel * s
        bias = b_bn.astype(jnp.float32) - mean * s
      leak = self.relu_leakiness if self.use_act else None
      chain.append(conv_pallas.ChainLayer(kernel, bias, leak))
      cin = self.num_filters
    if self.quantize_inference:
      from csmri_refinement_tpu.ops.quantize import chain_forward_int8
      return chain_forward_int8(x, chain, pad_mode=self.padding)
    return conv_pallas.chain_forward(x, chain, pad_mode=self.padding)

  @nn.compact
  def __call__(self, inp, train=False):
    x = inp
    use_bias = not self.use_bn
    if ((self.fused_inference or self.quantize_inference) and not train
        and self.kernel_size in (3, 4)
        and not isinstance(x, tuple)):
      x = self._fused_chain(x)
      if self.downsample:
        pooled = nn.max_pool(x, (2, 2), strides=(2, 2))
        return pooled, x
      return x
    for i in range(self.num_layers):
      if i == 0 and isinstance(x, tuple):
        # Unmaterialized skip-concat from ConvDecodeUnit (see
        # _SplitSumConv) — same 'conv_0' parameter tree as the dense path.
        x = _SplitSumConv(self.num_filters, self.kernel_size, use_bias,
                          self.padding, conv_init=self.conv_init,
                          bias_init=self.bias_init, dtype=self.dtype,
                          name='conv_0')(x[0], x[1])
        if self.use_bn:
          x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, scale_init=self.bn_init,
                           dtype=self.dtype, name='bn_0')(x)
        if self.use_act:
          x = nn.leaky_relu(x, negative_slope=self.relu_leakiness)
        continue
      conv = nn.Conv(self.num_filters, (self.kernel_size, self.kernel_size),
                     strides=1, padding='VALID', use_bias=use_bias,
                     kernel_init=self.conv_init, bias_init=self.bias_init,
                     dtype=self.dtype, name='conv_{}'.format(i))
      x = same_conv(conv, x, self.kernel_size, self.padding)
      if self.use_bn:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=self.bn_init,
                         dtype=self.dtype, name='bn_{}'.format(i))(x)
      if self.use_act:
        x = nn.leaky_relu(x, negative_slope=self.relu_leakiness)

    if self.downsample:
      pooled = nn.max_pool(x, (2, 2), strides=(2, 2))
      return pooled, x
    return x


class ConvDecodeUnit(nn.Module):
  in_channels: int
  encoder_channels: int
  num_filters: int
  relu_leakiness: float
  use_bn: bool
  use_act: bool = True
  kernel_size: int = 3
  transposed_kernel_size: int = 2
  num_layers: int = 0
  mode: str = 'transposed'
  padding: str = 'zero'
  act_upsampling_only: bool = False
  conv_init: Any = None
  conv_transposed_init: Any = None
  bias_init: Any = None
  bn_init: Any = None
  dtype: Any = None
  fused_inference: bool = False
  quantize_inference: bool = False

  @nn.compact
  def __call__(self, decode_path, encode_path=None, train=False):
    assert self.mode in UPSAMPLING_MODES
    use_bias = not self.use_bn or self.encoder_channels == 0
    x = decode_path
    k = self.kernel_size

    if self.mode == 'transposed':
      x = nn.ConvTranspose(
          self.num_filters,
          (self.transposed_kernel_size, self.transposed_kernel_size),
          strides=(2, 2), padding='VALID', use_bias=use_bias,
          kernel_init=self.conv_transposed_init, bias_init=self.bias_init,
          dtype=self.dtype, name='up_conv')(x)
      # torch ConvTranspose2d with k=2, s=2, p=0 exactly doubles; flax
      # VALID gives (2H + k - 2) — crop the overhang for k > 2.
      if self.transposed_kernel_size > 2:
        extra = self.transposed_kernel_size - 2
        x = x[:, :x.shape[1] - extra, :x.shape[2] - extra, :]
    elif self.mode == 'nn':
      x = _nearest_up2(x)
    elif self.mode == 'bilinear':
      x = _bilinear_up2(x)
    elif self.mode == 'pixelshuffle':
      conv = nn.Conv(4 * self.num_filters, (k, k), strides=1,
                     padding='VALID', use_bias=use_bias,
                     kernel_init=self.conv_init, bias_init=self.bias_init,
                     dtype=self.dtype, name='up_conv')
      x = same_conv(conv, x, k, self.padding)
      x = _pixel_shuffle(x, 2)
    elif self.mode == 'nn-resize-conv' and k == 4:
      # Fused subpixel form — identical math and parameters, ~2.8× faster
      x = SubpixelNNResizeConv(self.num_filters, k, use_bias, self.padding,
                               conv_init=self.conv_init,
                               bias_init=self.bias_init, dtype=self.dtype,
                               name='up_conv')(x)
    else:  # nn-resize-conv (k != 4) / nn-biresize-conv
      x = _nearest_up2(x) if self.mode == 'nn-resize-conv' \
          else _bilinear_up2(x)
      conv = nn.Conv(self.num_filters, (k, k), strides=1, padding='VALID',
                     use_bias=use_bias, kernel_init=self.conv_init,
                     bias_init=self.bias_init, dtype=self.dtype,
                     name='up_conv')
      x = same_conv(conv, x, k, self.padding)

    if self.act_upsampling_only:
      if self.use_bn:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=self.bn_init,
                         dtype=self.dtype, name='up_bn')(x)
      if self.use_act:
        x = nn.leaky_relu(x, negative_slope=self.relu_leakiness)

    if encode_path is not None:
      x = _pad_to_target(x, encode_path)
      if (_SPLIT_MERGE_CONV and self.act_upsampling_only and
          self.num_layers > 0):
        # Keep the skip-concat unmaterialized: the decode unit's first
        # conv consumes the (encode, decode) pair directly (exact —
        # conv is linear in input channels). Only valid when nothing
        # elementwise (merge BN/act) touches the concatenated tensor.
        x = (encode_path, x)
      else:
        x = jnp.concatenate([encode_path, x], axis=-1)

    if not self.act_upsampling_only:
      if self.use_bn:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, scale_init=self.bn_init,
                         dtype=self.dtype, name='merge_bn')(x)
      if self.use_act:
        x = nn.leaky_relu(x, negative_slope=self.relu_leakiness)

    if self.num_layers > 0:
      in_ch = sum(p.shape[-1] for p in x) if isinstance(x, tuple) \
          else x.shape[-1]
      x = ConvEncodeUnit(
          in_ch, self.num_layers, self.num_filters, k,
          self.relu_leakiness, self.use_bn, downsample=False,
          use_act=self.use_act, padding=self.padding,
          conv_init=self.conv_init, bias_init=self.bias_init,
          bn_init=self.bn_init, dtype=self.dtype,
          fused_inference=self.fused_inference,
          quantize_inference=self.quantize_inference,
          name='decode')(x, train=train)
    return x


class UNET(nn.Module):
  num_inputs: int
  num_outputs: int
  num_layers_per_scale: int
  encode_filters: Sequence[int]
  decode_filters: Sequence[int]
  output_activation: str
  kernel_size: int = 3
  transposed_kernel_size: int = 2
  relu_leakiness: Union[float, Tuple[float, float]] = DEFAULT_RELU_LEAKINESS
  use_bn: bool = True
  upsampling_mode: str = 'transposed'
  padding: str = 'zero'
  encoder_features: Optional[Sequence[int]] = None
  use_refinement: bool = False
  decoder_act_upsampling_only: bool = False
  remat: bool = False
  fused_inference: bool = False
  quantize_inference: bool = False
  weight_init: Any = None
  dtype: Any = None

  INPUT_KEYS = ('inp',)
  HAS_TRAIN_ARG = True

  @nn.compact
  def __call__(self, inp, train=False):
    assert self.output_activation in ('softmax', 'tanh', 'none')
    leakiness = self.relu_leakiness
    if isinstance(leakiness, float):
      leakiness = (leakiness, leakiness)

    init_params = weight_inits.resolve_inits(
        {'conv_weight': ('he_normal', DEFAULT_RELU_LEAKINESS),
         'conv_transposed_weight': ('he_normal', DEFAULT_RELU_LEAKINESS),
         'batchnorm_weight': ('uniform', 0.98, 1.02)},
        self.weight_init)
    conv_init, bias_init = weight_inits.kernel_and_bias(init_params, 'conv')
    convt_init, _ = weight_inits.kernel_and_bias(init_params,
                                                 'conv_transposed')
    bn_init = weight_inits.get_initializer(init_params['batchnorm_weight'])

    # Rematerialization: recompute per-scale activations in the backward
    # pass instead of storing them (jax.checkpoint) — trades FLOPs for HBM,
    # relevant for 512x512 training batches.
    encode_cls = nn.remat(ConvEncodeUnit) if self.remat else ConvEncodeUnit
    decode_cls = nn.remat(ConvDecodeUnit) if self.remat else ConvDecodeUnit

    num_encode_units = len(self.encode_filters)
    x = inp
    encoder_features = []
    encoder_last_feature = None
    for scale, num_filters in enumerate(self.encode_filters):
      downsample = scale != num_encode_units - 1
      unit = encode_cls(
          x.shape[-1], self.num_layers_per_scale, num_filters,
          self.kernel_size, leakiness[0], self.use_bn,
          downsample=downsample, padding=self.padding,
          conv_init=conv_init, bias_init=bias_init, bn_init=bn_init,
          dtype=self.dtype, fused_inference=self.fused_inference,
          quantize_inference=self.quantize_inference,
          name='encode_{}'.format(scale))
      if downsample:
        x, features = unit(x, train=train)
        encoder_features.append(features)
      else:
        x = unit(x, train=train)
        encoder_last_feature = x

    encode_channels = list(self.encode_filters)
    for scale, num_filters in enumerate(
        self.decode_filters[:num_encode_units - 1]):
      num_encode_channels = encode_channels[-(scale + 2)]
      unit = decode_cls(
          x.shape[-1], num_encode_channels, num_filters, leakiness[1],
          self.use_bn, kernel_size=self.kernel_size,
          transposed_kernel_size=self.transposed_kernel_size,
          num_layers=self.num_layers_per_scale, mode=self.upsampling_mode,
          padding=self.padding,
          act_upsampling_only=self.decoder_act_upsampling_only,
          conv_init=conv_init, conv_transposed_init=convt_init,
          bias_init=bias_init, bn_init=bn_init, dtype=self.dtype,
          fused_inference=self.fused_inference,
          quantize_inference=self.quantize_inference,
          name='decode_{}'.format(scale))
      x = unit(x, encoder_features[-(scale + 1)], train=train)

    for scale, num_filters in enumerate(
        self.decode_filters[num_encode_units - 1:]):
      unit = decode_cls(
          x.shape[-1], 0, num_filters, leakiness[1], self.use_bn,
          kernel_size=self.kernel_size,
          transposed_kernel_size=self.transposed_kernel_size,
          num_layers=self.num_layers_per_scale, mode=self.upsampling_mode,
          padding=self.padding,
          act_upsampling_only=self.decoder_act_upsampling_only,
          conv_init=conv_init, conv_transposed_init=convt_init,
          bias_init=bias_init, bn_init=bn_init, dtype=self.dtype,
          fused_inference=self.fused_inference,
          quantize_inference=self.quantize_inference,
          name='up_decode_{}'.format(scale))
      x = unit(x, train=train)

    pred = nn.Conv(self.num_outputs, (1, 1), strides=1, padding='VALID',
                   use_bias=True, kernel_init=conv_init,
                   bias_init=bias_init, dtype=self.dtype, name='head')(x)
    if self.output_activation == 'softmax':
      pred = nn.softmax(pred, axis=-1)
    elif self.output_activation == 'tanh':
      pred = nn.tanh(pred)

    if self.use_refinement:
      pred = inp + pred

    if self.encoder_features is not None:
      encoded = encoder_features + [encoder_last_feature]
      return {
          'pred': pred,
          'features': [encoded[idx] for idx in self.encoder_features],
      }
    return pred
