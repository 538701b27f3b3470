"""Full-model forward parity: reference-faithful torch models vs the flax
models on the SAME weights.

Round 1 established per-op/per-layer golden parity; these tests run entire
networks — the paper RecNet (3 blocks x 3 convs x 32 filters), the flagship
refinement U-Net, the segmentation-style pixelshuffle U-Net, and the
PatchGAN/FC discriminators — through a modern-torch twin of the reference
architecture and through this framework with converted weights, and assert
the outputs agree. The end-to-end test converts the agreement into the
north-star quality budget: PSNR within 0.1 dB and SSIM within 0.001 of the
reference forward (BASELINE.md rebuild quality target).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import serialization  # noqa: E402

from csmri_refinement_tpu.models.discriminators import (  # noqa: E402
    CNNDiscriminator)
from csmri_refinement_tpu.models.recnet import RecNet  # noqa: E402
from csmri_refinement_tpu.models.unet import UNET  # noqa: E402
from csmri_refinement_tpu.utils import torch_import  # noqa: E402

import torch_twins  # noqa: E402


# Heavyweight end-to-end/architecture tests: deselect with -m "not slow"
pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _nhwc(t):
  return np.ascontiguousarray(
      np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1)))


def _nchw(a):
  return torch.from_numpy(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))


def _load(model, example_args, converted):
  variables = model.init(jax.random.PRNGKey(0), *example_args)
  params = serialization.from_state_dict(variables['params'],
                                         converted['params'])
  out = {'params': params}
  if 'batch_stats' in variables:
    out['batch_stats'] = serialization.from_state_dict(
        variables['batch_stats'], converted.get('batch_stats', {}))
  return out


def test_recnet_paper_config_forward_parity(rng):
  """Paper config-1 RecNet (3x3x32), full cascade incl. 3 DC layers."""
  torch.manual_seed(0)
  tm = torch_twins.TorchRecNet(num_blocks=3, num_convs=3, num_filters=32)
  tm.eval()

  inp = rng.randn(2, 64, 64, 2).astype(np.float32) * 0.3
  ksp = rng.randn(2, 64, 64, 2).astype(np.float32) * 0.3
  mask = (rng.rand(2, 64, 64, 1) < 0.4).astype(np.float32)

  with torch.no_grad():
    t_out = _nhwc(tm(_nchw(inp), _nchw(ksp), _nchw(mask)))

  model = RecNet(num_blocks=3, num_convs=3, num_filters=32)
  converted = torch_import.convert_recnet(tm.state_dict(), num_blocks=3,
                                          num_convs=3)
  variables = _load(model, (jnp.asarray(inp), jnp.asarray(ksp),
                            jnp.asarray(mask)), converted)
  j_out = np.asarray(jax.jit(model.apply)(variables, inp, ksp, mask))

  np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('unet_kwargs', [
    # Flagship refinement generator (configs/2-refinement.json)
    dict(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
         encode_filters=[32, 64, 128], decode_filters=[64, 32],
         kernel_size=4, upsampling_mode='nn-resize-conv',
         output_activation='none', padding='reflection',
         decoder_act_upsampling_only=True),
    # Segmentation-style: pixelshuffle upsampling, zero pad, legacy decoder
    dict(num_inputs=1, num_outputs=4, num_layers_per_scale=1,
         encode_filters=[8, 16, 32], decode_filters=[16, 8],
         kernel_size=3, upsampling_mode='pixelshuffle',
         output_activation='none', padding='zero',
         decoder_act_upsampling_only=False),
    # Transposed-conv upsampling + extra (non-concat) decode unit + tanh
    dict(num_inputs=2, num_outputs=2, num_layers_per_scale=1,
         encode_filters=[8, 16], decode_filters=[8, 8],
         kernel_size=3, upsampling_mode='transposed',
         output_activation='tanh', padding='replication',
         decoder_act_upsampling_only=False),
])
def test_unet_forward_parity(rng, unet_kwargs):
  torch.manual_seed(1)
  tm = torch_twins.TorchUNET(**unet_kwargs)
  tm.eval()

  x = rng.randn(2, 32, 32, unet_kwargs['num_inputs']).astype(np.float32)
  with torch.no_grad():
    t_out = _nhwc(tm(_nchw(x)))

  model = UNET(**unet_kwargs)
  converted = torch_import.convert_unet(
      tm.state_dict(),
      num_layers_per_scale=unet_kwargs['num_layers_per_scale'],
      encode_filters=unet_kwargs['encode_filters'],
      decode_filters=unet_kwargs['decode_filters'],
      upsampling_mode=unet_kwargs['upsampling_mode'],
      decoder_act_upsampling_only=unet_kwargs[
          'decoder_act_upsampling_only'])
  variables = _load(model, (jnp.asarray(x),), converted)
  j_out = np.asarray(jax.jit(
      lambda v, x: model.apply(v, x, train=False))(variables, x))

  np.testing.assert_allclose(j_out, t_out, atol=2e-5, rtol=1e-4)


def test_discriminator_patchgan_forward_parity(rng):
  """Scaled paper discriminator: strided PatchGAN with not-first batch
  norm, reflect pad, dropout (eval no-op), feature outputs for FM loss."""
  kwargs = dict(num_inputs=1, num_filters_per_layer=[8, 16, 32, 64],
                strides=[2, 2, 2, 1], kernel_sizes=4,
                final_conv_kernel_size=4, padding='reflection',
                act_fn='lrelu', relu_leakiness=0.2, dropout_after=[2],
                dropout_prob=0.5, use_norm_layers='not-first',
                norm_layer='batch', compute_features=True)
  torch.manual_seed(2)
  tm = torch_twins.TorchCNNDiscriminator(**kwargs)
  tm.eval()

  x = rng.rand(2, 64, 64, 1).astype(np.float32)
  with torch.no_grad():
    t_out = tm(_nchw(x))

  model = CNNDiscriminator(**kwargs)
  converted = torch_import.convert_discriminator(
      tm.state_dict(), num_filters_per_layer=kwargs['num_filters_per_layer'],
      use_norm_layers='not-first', norm_layer='batch',
      dropout_after=kwargs['dropout_after'])
  variables = _load(model, (jnp.asarray(x),), converted)
  j_out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

  np.testing.assert_allclose(np.asarray(j_out['logits']),
                             _nhwc(t_out['logits']), atol=2e-5, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(j_out['prob']),
                             _nhwc(t_out['prob']), atol=2e-5, rtol=1e-4)
  assert len(j_out['features']) == len(t_out['features'])
  for jf, tf in zip(j_out['features'], t_out['features']):
    np.testing.assert_allclose(np.asarray(jf), _nhwc(tf), atol=2e-5,
                               rtol=1e-4)


def test_discriminator_fc_head_forward_parity(rng):
  kwargs = dict(num_inputs=1, num_filters_per_layer=[4, 8],
                strides=[2, 2], kernel_sizes=3, fc_layers=[16, 1],
                padding='zero', use_norm_layers=False,
                compute_features=False)
  torch.manual_seed(3)
  tm = torch_twins.TorchCNNDiscriminator(spatial_shape=(16, 16), **kwargs)
  tm.eval()

  x = rng.rand(2, 16, 16, 1).astype(np.float32)
  with torch.no_grad():
    t_out = tm(_nchw(x))

  model = CNNDiscriminator(**kwargs)
  converted = torch_import.convert_discriminator(
      tm.state_dict(), num_filters_per_layer=kwargs['num_filters_per_layer'],
      use_norm_layers=False, fc_layers=kwargs['fc_layers'],
      conv_output_shape=(4, 4))
  variables = _load(model, (jnp.asarray(x),), converted)
  j_out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)

  np.testing.assert_allclose(np.asarray(j_out['logits']),
                             t_out['logits'].numpy(), atol=2e-5, rtol=1e-4)


def test_recnet_end_to_end_quality_within_north_star(rng):
  """Measured north-star budget: on a real undersampling pipeline, the
  framework's reconstruction quality matches the torch reference forward
  within 0.1 dB PSNR and 0.001 SSIM (BASELINE.md rebuild quality target)."""
  from csmri_refinement_tpu.metrics.image_metrics import compute_psnr
  from csmri_refinement_tpu.ops import undersample as us_ops
  from csmri_refinement_tpu.ops.ssim import ssim

  torch.manual_seed(4)
  tm = torch_twins.TorchRecNet(num_blocks=3, num_convs=3, num_filters=32)
  tm.eval()

  # Synthetic phantom batch through the real varden-8x undersampling path
  key = jax.random.PRNGKey(7)
  target = jax.random.uniform(key, (4, 64, 64))
  batch = jax.jit(lambda k, t: us_ops.undersample_batch(
      k, t, 'varden', 4))(key, target)
  inp = np.asarray(batch['inp'])
  ksp = np.asarray(batch['kspace'])
  mask = np.asarray(batch['mask'])

  with torch.no_grad():
    t_pred = _nhwc(tm(_nchw(inp), _nchw(ksp), _nchw(mask)))

  model = RecNet(num_blocks=3, num_convs=3, num_filters=32)
  converted = torch_import.convert_recnet(tm.state_dict(), num_blocks=3,
                                          num_convs=3)
  variables = _load(model, (jnp.asarray(inp), jnp.asarray(ksp),
                            jnp.asarray(mask)), converted)
  j_pred = np.asarray(jax.jit(model.apply)(variables, inp, ksp, mask))

  def magnitude(x):
    return np.clip(np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2), 0.0, 1.0)

  tgt = magnitude(np.stack([np.asarray(target),
                            np.zeros_like(np.asarray(target))], axis=-1))
  psnr_t = float(compute_psnr(jnp.asarray(magnitude(t_pred)), jnp.asarray(tgt)))
  psnr_j = float(compute_psnr(jnp.asarray(magnitude(j_pred)), jnp.asarray(tgt)))
  ssim_t = float(ssim(jnp.asarray(magnitude(t_pred))[..., None],
                      jnp.asarray(tgt)[..., None]))
  ssim_j = float(ssim(jnp.asarray(magnitude(j_pred))[..., None],
                      jnp.asarray(tgt)[..., None]))

  assert abs(psnr_j - psnr_t) < 0.1, (psnr_j, psnr_t)
  assert abs(ssim_j - ssim_t) < 0.001, (ssim_j, ssim_t)
  # And the raw forwards agree far tighter than the quality budget
  assert np.max(np.abs(j_pred - t_pred)) < 1e-3


def test_vgg19_block_outputs_match_torch(rng, tmp_path):
  """VGG19 slicing + normalization parity: convert a (random-weight) torch
  cfg-'E' features stack via convert_vgg19, load with load_vgg19_params,
  and compare every block output 0..5. Proves the architecture/slicing
  matches reference models/vgg.py:35-80 without needing the ImageNet
  artifact."""
  from csmri_refinement_tpu.models.vgg import VGG19, load_vgg19_params

  torch.manual_seed(5)
  tm = torch_twins.TorchVGG19Features()
  tm.eval()

  npz = str(tmp_path / 'vgg19.npz')
  keys = torch_import.convert_vgg19(tm.state_dict(), npz)
  weight_keys = [k for k in keys if not k.startswith('__')]
  assert len(weight_keys) == 32  # 16 convs x (weight, bias)
  assert '__sha256__' in keys    # artifact-contract manifest entry

  params = load_vgg19_params(npz)
  model = VGG19(output_blocks=(0, 1, 2, 3, 4, 5))

  x = rng.rand(2, 64, 64, 3).astype(np.float32)
  mean = torch.tensor([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)
  std = torch.tensor([0.229, 0.224, 0.225]).reshape(1, 3, 1, 1)
  with torch.no_grad():
    t_blocks = tm.block_outputs(_nchw(x), mean, std)

  j_blocks = jax.jit(lambda p, x: model.apply({'params': p}, x))(params, x)

  assert len(j_blocks) == len(t_blocks) == 6
  for jb, tb in zip(j_blocks, t_blocks):
    np.testing.assert_allclose(np.asarray(jb), _nhwc(tb), atol=1e-4,
                               rtol=1e-3)


def test_vgg19_random_init_requires_opt_in():
  from csmri_refinement_tpu.models.vgg import load_vgg19_params
  with pytest.raises(ValueError, match='vgg_random_init'):
    load_vgg19_params(None)
  params = load_vgg19_params(None, allow_random_init=True)
  assert 'conv_0' in params


def _flagship_composite(seed=6):
  """Torch twin + flax model of the FULL flagship generator
  (configs/2-refinement.json): frozen RecNet 3x3x32 -> per-example _scale
  -> refinement U-Net [32,64,128]/[64,32] -> learned-scale add -> _unscale
  (/root/reference/models/refinement_wrapper.py:51-92,169-194)."""
  from csmri_refinement_tpu.models.refinement_wrapper import (
      RefinementWrapper)

  unet_kwargs = dict(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
                     encode_filters=[32, 64, 128], decode_filters=[64, 32],
                     kernel_size=4, upsampling_mode='nn-resize-conv',
                     output_activation='none', padding='reflection',
                     decoder_act_upsampling_only=True)
  torch.manual_seed(seed)
  tm = torch_twins.TorchRefinementWrapper(
      torch_twins.TorchRecNet(num_blocks=3, num_convs=3, num_filters=32),
      torch_twins.TorchUNET(**unet_kwargs),
      mode='real-penalty-add', input_mode='output')
  tm.scale.data.fill_(0.35)   # learned scalar nonzero so the residual path
  tm.eval()                   # actually contributes to parity

  model = RefinementWrapper(
      pretrained_model=RecNet(num_blocks=3, num_convs=3, num_filters=32),
      learnable_model=UNET(**unet_kwargs),
      mode='real-penalty-add', input_mode='output')
  converted = torch_import.convert_refinement_wrapper(
      tm.state_dict(),
      recnet_kwargs=dict(num_blocks=3, num_convs=3),
      unet_kwargs=dict(
          num_layers_per_scale=2, encode_filters=[32, 64, 128],
          decode_filters=[64, 32], upsampling_mode='nn-resize-conv',
          decoder_act_upsampling_only=True))
  return tm, model, converted


def test_refinement_wrapper_flagship_forward_parity(rng):
  """Full composite generator (frozen RecNet -> _scale -> UNET ->
  learned-scale add -> _unscale) on shared weights, all output keys."""
  tm, model, converted = _flagship_composite()

  inp = rng.randn(2, 64, 64, 2).astype(np.float32) * 0.3
  ksp = rng.randn(2, 64, 64, 2).astype(np.float32) * 0.3
  mask = (rng.rand(2, 64, 64, 1) < 0.4).astype(np.float32)

  with torch.no_grad():
    t_out = tm(_nchw(inp), _nchw(ksp), _nchw(mask))

  variables = _load(model, (jnp.asarray(inp), jnp.asarray(ksp),
                            jnp.asarray(mask)), converted)
  j_out = jax.jit(lambda v, i, k, m: model.apply(v, i, k, m, train=False))(
      variables, inp, ksp, mask)

  for key in ('pred', 'pretrained', 'prescaled_refinement',
              'scaled_refinement'):
    np.testing.assert_allclose(
        np.asarray(j_out[key]), _nhwc(t_out[key]), atol=1e-3, rtol=1e-4,
        err_msg=key)
  assert float(np.max(np.abs(np.asarray(j_out['pred']) -
                             _nhwc(t_out['pred'])))) < 1e-3


def test_flagship_composite_end_to_end_quality_within_north_star(rng):
  """North-star budget on the FLAGSHIP generator at the bench resolution:
  256^2 varden-8x pipeline through the full composite, PSNR within 0.1 dB
  and SSIM within 0.001 of the torch reference forward (extends the
  RecNet-only 64^2 version of this test per VERDICT round 2)."""
  from csmri_refinement_tpu.metrics.image_metrics import compute_psnr
  from csmri_refinement_tpu.ops import undersample as us_ops
  from csmri_refinement_tpu.ops.ssim import ssim

  tm, model, converted = _flagship_composite(seed=8)

  key = jax.random.PRNGKey(9)
  target = jax.random.uniform(key, (2, 256, 256))
  batch = jax.jit(lambda k, t: us_ops.undersample_batch(
      k, t, 'varden', 8))(key, target)
  inp = np.asarray(batch['inp'])
  ksp = np.asarray(batch['kspace'])
  mask = np.asarray(batch['mask'])

  with torch.no_grad():
    t_pred = _nhwc(tm(_nchw(inp), _nchw(ksp), _nchw(mask))['pred'])

  variables = _load(model, (jnp.asarray(inp), jnp.asarray(ksp),
                            jnp.asarray(mask)), converted)
  j_pred = np.asarray(jax.jit(
      lambda v, i, k, m: model.apply(v, i, k, m, train=False)['pred'])(
          variables, inp, ksp, mask))

  def magnitude(x):
    return np.clip(np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2), 0.0, 1.0)

  tgt = magnitude(np.stack([np.asarray(target),
                            np.zeros_like(np.asarray(target))], axis=-1))
  psnr_t = float(compute_psnr(jnp.asarray(magnitude(t_pred)),
                              jnp.asarray(tgt)))
  psnr_j = float(compute_psnr(jnp.asarray(magnitude(j_pred)),
                              jnp.asarray(tgt)))
  ssim_t = float(ssim(jnp.asarray(magnitude(t_pred))[..., None],
                      jnp.asarray(tgt)[..., None]))
  ssim_j = float(ssim(jnp.asarray(magnitude(j_pred))[..., None],
                      jnp.asarray(tgt)[..., None]))

  assert abs(psnr_j - psnr_t) < 0.1, (psnr_j, psnr_t)
  assert abs(ssim_j - ssim_t) < 0.001, (ssim_j, ssim_t)
