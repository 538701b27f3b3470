"""Reference-faithful PyTorch twins of the model families, for parity tests.

These rebuild the reference architectures in *modern* torch (torch.fft
replaces the CUDA-only pytorch_fft the reference needs) so the test suite
can measure end-to-end forward parity between a torch reference model and
this framework's flax models on the same weights — something round 1 only
established per-layer.

State-dict key layout intentionally matches the reference module naming
(``conv_blocks.{b}.layers.{i}``, ``encode_units.{s}.encode.{i}``,
``convs.{i}``, ``features.{i}`` ...) so
:mod:`csmri_refinement_tpu.utils.torch_import` converts them directly.

Architecture sources (studied, not copied):
* RecNet: /root/reference/models/recnet.py:29-161 + DC layer
  /root/reference/data/reconstruction/deep_med_lib/my_pytorch/myfft.py:131-163
* UNET: /root/reference/models/unet.py:27-290
* CNNDiscriminator: /root/reference/models/discriminators.py:50-247
* VGG19 feature stack: torchvision cfg 'E' (/root/reference/models/vgg.py:35)
* SAME padding: /root/reference/models/utils.py:58-85
* need_bias: /root/reference/models/utils.py:47-55
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def same_pad_layer(kernel_size, stride=1, mode='zero', dilation=1):
  eff = kernel_size + (kernel_size - 1) * (dilation - 1)
  total = int(math.ceil((eff - 1.0) / stride))
  side = total // 2
  pad = side if total % 2 == 0 else (side, side + 1, side, side + 1)
  cls = {'zero': nn.ZeroPad2d, 'reflection': nn.ReflectionPad2d,
         'replication': nn.ReplicationPad2d}[mode]
  return cls(pad)


def _need_bias(use_norm_layers, norm_layer):
  if not use_norm_layers or use_norm_layers == 'not-first' \
     or norm_layer == 'instance':
    return True
  return False


def _act(name, leakiness, num_channels=None):
  if name == 'relu':
    return nn.ReLU()
  if name == 'lrelu':
    return nn.LeakyReLU(leakiness)
  if name == 'prelu':
    return nn.PReLU(num_parameters=num_channels, init=leakiness)
  if name == 'tanh':
    return nn.Tanh()
  raise ValueError(name)


# ---------------------------------------------------------------- RecNet


def data_consistency_torch(x, k0, mask):
  """x: (B,2,H,W) image, k0: (B,2,H,W) sampled k-space, mask: (B,1|2,H,W).

  Ortho-normalized 2D FFT DC step (myfft.py:145-163, noiseless branch).
  """
  xc = torch.complex(x[:, 0], x[:, 1])
  k = torch.fft.fft2(xc, norm='ortho')
  k = torch.stack([k.real, k.imag], dim=1)
  m = mask[:, :1]
  # Reference merge: k0 arrives pre-masked from undersampling, so it is
  # added un-masked (myfft.py:141, noiseless branch)
  out = (1 - m) * k + k0
  oc = torch.complex(out[:, 0], out[:, 1])
  xr = torch.fft.ifft2(oc, norm='ortho')
  return torch.stack([xr.real, xr.imag], dim=1)


class TorchConvBlock(nn.Module):
  def __init__(self, num_convs, num_filters, kernel_size=3,
               relu_leakiness=0.01, padding='zero', num_inputs=2,
               num_outputs=2):
    super().__init__()
    mods, c_in = [], num_inputs
    for _ in range(num_convs - 1):
      mods += [same_pad_layer(kernel_size, 1, padding),
               nn.Conv2d(c_in, num_filters, kernel_size, bias=True),
               nn.LeakyReLU(relu_leakiness)]
      c_in = num_filters
    mods += [same_pad_layer(kernel_size, 1, padding),
             nn.Conv2d(c_in, num_outputs, kernel_size, bias=True)]
    self.layers = nn.Sequential(*mods)

  def forward(self, x):
    return self.layers(x)


class TorchRecNet(nn.Module):
  def __init__(self, num_blocks, num_convs, num_filters, kernel_size=3,
               relu_leakiness=0.01, padding='zero'):
    super().__init__()
    self.conv_blocks = nn.ModuleList([
        TorchConvBlock(num_convs, num_filters, kernel_size, relu_leakiness,
                       padding) for _ in range(num_blocks)])

  def forward(self, inp, kspace, mask):
    x = inp
    for block in self.conv_blocks:
      x = block(x)
      x = data_consistency_torch(x, kspace, mask)
    return x


# ------------------------------------------------------------------ UNET


class TorchConvEncodeUnit(nn.Module):
  def __init__(self, in_channels, num_layers, num_filters, kernel_size,
               relu_leakiness, use_bn, downsample, use_act=True,
               padding='zero'):
    super().__init__()
    self.downsample = downsample
    mods = []
    for _ in range(num_layers):
      mods += [same_pad_layer(kernel_size, 1, padding),
               nn.Conv2d(in_channels, num_filters, kernel_size,
                         bias=not use_bn)]
      in_channels = num_filters
      if use_bn:
        mods += [nn.BatchNorm2d(num_filters)]
      if use_act:
        mods += [nn.LeakyReLU(relu_leakiness)]
    self.encode = nn.Sequential(*mods)
    if downsample:
      self.pool = nn.MaxPool2d(2, 2)

  def forward(self, x):
    x = self.encode(x)
    if self.downsample:
      return self.pool(x), x
    return x


class TorchConvDecodeUnit(nn.Module):
  def __init__(self, in_channels, encoder_channels, num_filters,
               relu_leakiness, use_bn, kernel_size=3,
               transposed_kernel_size=2, num_layers=0, mode='transposed',
               padding='zero', act_upsampling_only=False):
    super().__init__()
    use_bias = not use_bn or encoder_channels == 0
    if mode == 'transposed':
      up = [nn.ConvTranspose2d(in_channels, num_filters,
                               transposed_kernel_size, stride=2,
                               bias=use_bias)]
      in_channels = num_filters
    elif mode in ('nn', 'bilinear'):
      up = [nn.Upsample(scale_factor=2,
                        mode='nearest' if mode == 'nn' else 'bilinear')]
    elif mode == 'pixelshuffle':
      up = [same_pad_layer(kernel_size, 1, padding),
            nn.Conv2d(in_channels, 4 * num_filters, kernel_size,
                      bias=use_bias),
            nn.PixelShuffle(2)]
      in_channels = num_filters
    elif mode in ('nn-resize-conv', 'nn-biresize-conv'):
      resize = 'nearest' if mode == 'nn-resize-conv' else 'bilinear'
      up = [nn.Upsample(scale_factor=2, mode=resize),
            same_pad_layer(kernel_size, 1, padding),
            nn.Conv2d(in_channels, num_filters, kernel_size, bias=use_bias)]
      in_channels = num_filters
    else:
      raise ValueError(mode)

    dec = []
    if act_upsampling_only:
      if use_bn:
        up += [nn.BatchNorm2d(in_channels)]
      up += [nn.LeakyReLU(relu_leakiness)]
    else:
      if use_bn:
        dec += [nn.BatchNorm2d(in_channels + encoder_channels)]
      dec += [nn.LeakyReLU(relu_leakiness)]
    if num_layers > 0:
      dec += [TorchConvEncodeUnit(in_channels + encoder_channels,
                                  num_layers, num_filters, kernel_size,
                                  relu_leakiness, use_bn, downsample=False,
                                  padding=padding)]
    self.upsample = nn.Sequential(*up)
    self.decode = nn.Sequential(*dec)

  def forward(self, x, skip=None):
    x = self.upsample(x)
    if skip is not None:
      dh = skip.shape[2] - x.shape[2]
      dw = skip.shape[3] - x.shape[3]
      if dh or dw:
        x = F.pad(x, (0, dw, 0, dh), mode='reflect')
      x = torch.cat((skip, x), dim=1)
    return self.decode(x)


class TorchUNET(nn.Module):
  def __init__(self, num_inputs, num_outputs, num_layers_per_scale,
               encode_filters, decode_filters, output_activation='none',
               kernel_size=3, transposed_kernel_size=2, relu_leakiness=0.1,
               use_bn=True, upsampling_mode='transposed', padding='zero',
               decoder_act_upsampling_only=False):
    super().__init__()
    c_in = num_inputs
    n_enc = len(encode_filters)
    units = []
    for scale, nf in enumerate(encode_filters):
      units.append(TorchConvEncodeUnit(
          c_in, num_layers_per_scale, nf, kernel_size, relu_leakiness,
          use_bn, downsample=scale != n_enc - 1, padding=padding))
      c_in = nf
    self.encode_units = nn.ModuleList(units)

    concat_units = []
    for scale, nf in enumerate(decode_filters[:n_enc - 1]):
      concat_units.append(TorchConvDecodeUnit(
          c_in, encode_filters[-(scale + 2)], nf, relu_leakiness, use_bn,
          kernel_size, transposed_kernel_size, num_layers_per_scale,
          upsampling_mode, padding, decoder_act_upsampling_only))
      c_in = nf
    self.concat_decode_units = nn.ModuleList(concat_units)

    units = []
    for nf in decode_filters[n_enc - 1:]:
      units.append(TorchConvDecodeUnit(
          c_in, 0, nf, relu_leakiness, use_bn, kernel_size,
          transposed_kernel_size, num_layers_per_scale, upsampling_mode,
          padding, decoder_act_upsampling_only))
      c_in = nf
    self.decode_units = nn.ModuleList(units)

    head = [nn.Conv2d(c_in, num_outputs, 1, bias=True)]
    if output_activation == 'tanh':
      head += [nn.Tanh()]
    elif output_activation == 'softmax':
      head += [nn.Softmax(dim=1)]
    self.head = nn.Sequential(*head)

  def forward(self, inp):
    x, skips = inp, []
    for unit in self.encode_units:
      if unit.downsample:
        x, feat = unit(x)
        skips.append(feat)
      else:
        x = unit(x)
    for scale, unit in enumerate(self.concat_decode_units):
      x = unit(x, skips[-(scale + 1)])
    for unit in self.decode_units:
      x = unit(x)
    return self.head(x)


# --------------------------------------------------------- Discriminator


class TorchCNNDiscriminator(nn.Module):
  def __init__(self, num_inputs, num_filters_per_layer, strides,
               kernel_sizes=3, fc_layers=(), spatial_shape=None,
               act_fn='lrelu', relu_leakiness=0.2, use_norm_layers=True,
               norm_layer='batch', padding='zero',
               final_conv_kernel_size=1, use_biases=True,
               compute_features=False, dropout_after=(), dropout_prob=0.5):
    super().__init__()
    if isinstance(kernel_sizes, int):
      kernel_sizes = [kernel_sizes] * len(num_filters_per_layer)
    self.compute_features = compute_features
    self._feature_idx = []

    c_in, mods = num_inputs, []
    use_norm = use_norm_layers
    for li, (nf, k, s) in enumerate(zip(num_filters_per_layer,
                                        kernel_sizes, strides)):
      bias = use_biases and _need_bias(use_norm, norm_layer)
      mods += [same_pad_layer(k, s, padding),
               nn.Conv2d(c_in, nf, k, stride=s, bias=bias)]
      if use_norm != 'not-first' and use_norm:
        mods += [nn.BatchNorm2d(nf) if norm_layer == 'batch'
                 else nn.InstanceNorm2d(nf, affine=False)]
      elif use_norm == 'not-first':
        use_norm = True
      mods += [_act(act_fn, relu_leakiness, nf)]
      self._feature_idx.append(len(mods) - 1)
      if li in dropout_after:
        mods += [nn.Dropout2d(dropout_prob)]
      c_in = nf
    self.convs = nn.Sequential(*mods)

    if fc_layers:
      with torch.no_grad():
        flat = self.convs(torch.zeros(1, num_inputs, *spatial_shape))
      dims = int(flat.reshape(1, -1).shape[1])
      mods = []
      for nf in fc_layers[:-1]:
        mods += [nn.Linear(dims, nf, bias=use_biases),
                 _act(act_fn, relu_leakiness, nf)]
        dims = nf
      mods += [nn.Linear(dims, fc_layers[-1])]
      self.fcs = nn.Sequential(*mods)
      self.final_conv = None
    else:
      self.fcs = None
      # NOTE: no padding before the final conv (discriminators.py:173-176)
      self.final_conv = nn.Sequential(
          nn.Conv2d(c_in, 1, final_conv_kernel_size, bias=use_biases))

  def forward(self, inp):
    feats = []
    x = inp
    for i, layer in enumerate(self.convs):
      x = layer(x)
      if i in self._feature_idx:
        feats.append(x)
    if self.fcs is not None:
      x = x.reshape(x.shape[0], -1)
      for fc in self.fcs:
        x = fc(x)
        feats.append(x)
    else:
      x = self.final_conv(x)
      feats.append(x)
    out = {'prob': torch.sigmoid(x), 'logits': x}
    if self.compute_features:
      out['features'] = feats
    return out


# ------------------------------------------------------------------ VGG19

_VGG_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
            512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']


class TorchVGG19Features(nn.Module):
  """torchvision vgg19 ``features`` stack (cfg 'E'), identical module
  indexing, so its state dict keys are ``features.{i}.weight/bias``."""

  def __init__(self):
    super().__init__()
    mods, c_in = [], 3
    for item in _VGG_CFG:
      if item == 'M':
        mods += [nn.MaxPool2d(2, 2)]
      else:
        mods += [nn.Conv2d(c_in, item, 3, padding=1), nn.ReLU()]
        c_in = item
    self.features = nn.Sequential(*mods)

  def block_outputs(self, x, mean, std):
    """Outputs of each block (ending right before each max-pool, plus the
    final post-pool block 5), after ImageNet normalization — the reference
    VGG19 slicing (vgg.py:35-43)."""
    x = (x - mean) / std
    outs = []
    for layer in self.features:
      if isinstance(layer, nn.MaxPool2d):
        outs.append(x)
      x = layer(x)
    outs.append(x)  # block 5 = the pool-only block after the last conv
    return outs


# --------------------------------------------------- RefinementWrapper


def _scale_torch(tensor):
  """Per-example/channel min-max scale to (-1, 1)
  (refinement_wrapper.py:51-73)."""
  b, c, h, w = tensor.shape
  out = tensor.reshape(b, c, h * w)
  minimum = out.min(dim=2, keepdim=True).values
  out = out - minimum
  maximum = out.max(dim=2, keepdim=True).values
  out = out / maximum
  out = out * 2 - 1
  return out.view(b, c, h, w), minimum, maximum


def _unscale_torch(tensor, minimum, maximum):
  """(-1, 1) -> original range (refinement_wrapper.py:76-92)."""
  b, c, h, w = tensor.shape
  out = tensor.reshape(b, c, h * w)
  out = (out + 1) / 2
  out = out * maximum + minimum
  return out.view(b, c, h, w)


class TorchRefinementWrapper(nn.Module):
  """Composite generator: frozen pretrained reconstruction net + learnable
  residual U-Net combined by add / real-penalty-add
  (refinement_wrapper.py:95-220, combine logic :164-194)."""

  def __init__(self, pretrained_model, learnable_model,
               mode='real-penalty-add', input_mode='output'):
    super().__init__()
    self.pretrained_model = pretrained_model
    self.learnable_model = learnable_model
    self.mode = mode
    self.input_mode = input_mode
    for p in self.pretrained_model.parameters():
      p.requires_grad = False
    if mode == 'real-penalty-add':
      self.scale = nn.Parameter(torch.zeros(1))

  def _learnable_input(self, inp, out_pretrained):
    if self.input_mode == 'input':
      return inp
    if self.input_mode == 'output':
      return out_pretrained
    return torch.cat([inp, out_pretrained], dim=1)

  def forward(self, inp, kspace=None, mask=None):
    if kspace is None:
      out_pretrained = self.pretrained_model(inp)
    else:
      out_pretrained = self.pretrained_model(inp, kspace, mask)
    out_pretrained = out_pretrained.detach()

    if self.mode == 'add':
      return out_pretrained + self.learnable_model(
          self._learnable_input(inp, out_pretrained))

    pretrained_real = out_pretrained[:, 0].unsqueeze(1).contiguous()
    pretrained_imag = out_pretrained[:, 1].unsqueeze(1).contiguous()
    pretrained_real_scaled, minimum, maximum = _scale_torch(pretrained_real)

    out_learnable = self.learnable_model(
        self._learnable_input(inp, out_pretrained))
    out_learnable_scaled = self.scale * out_learnable
    refined = pretrained_real_scaled + out_learnable_scaled
    out_real = _unscale_torch(refined, minimum, maximum)
    return {
        'pred': torch.cat((out_real, pretrained_imag), dim=1),
        'pretrained': out_pretrained,
        'prescaled_refinement': out_learnable,
        'scaled_refinement': out_learnable_scaled,
    }
