"""Torch-checkpoint importer tests.

Structure tests check the converted trees slot exactly into our flax
models; numerical tests verify the tensor-layout conversions against torch
functional ops (conv OIHW→HWIO, transposed conv IOHW→flipped HWIO,
linear transpose).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import serialization  # noqa: E402

from csmri_refinement_tpu.utils import torch_import  # noqa: E402
from csmri_refinement_tpu.models.recnet import RecNet  # noqa: E402
from csmri_refinement_tpu.models.unet import UNET  # noqa: E402
from csmri_refinement_tpu.models.discriminators import (  # noqa: E402

    CNNDiscriminator)

# Heavyweight end-to-end/architecture tests: deselect with -m "not slow"
pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _recnet_state_dict(rng, num_blocks=2, num_convs=2, num_filters=4):
  """Synthetic reference-named RecNet state dict (conv j at layers.3j+1)."""
  sd = {}
  for b in range(num_blocks):
    c_in = 2
    for j in range(num_convs):
      c_out = num_filters if j < num_convs - 1 else 2
      sd['conv_blocks.{}.layers.{}.weight'.format(b, 3 * j + 1)] = \
          torch.from_numpy(rng.randn(c_out, c_in, 3, 3).astype(np.float32))
      sd['conv_blocks.{}.layers.{}.bias'.format(b, 3 * j + 1)] = \
          torch.from_numpy(rng.randn(c_out).astype(np.float32))
      c_in = c_out
  return sd


def test_recnet_conversion_structure_and_values(rng):
  sd = _recnet_state_dict(rng)
  converted = torch_import.convert_recnet(sd, num_blocks=2, num_convs=2)

  model = RecNet(num_blocks=2, num_convs=2, num_filters=4)
  inp = jnp.zeros((1, 8, 8, 2))
  ksp = jnp.zeros((1, 8, 8, 2))
  mask = jnp.ones((1, 8, 8, 1))
  variables = model.init(jax.random.PRNGKey(0), inp, ksp, mask)

  restored = serialization.from_state_dict(variables['params'],
                                           converted['params'])
  # Forward must run with the converted params
  x = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
  out = model.apply({'params': restored}, x, ksp, mask)
  assert out.shape == (1, 8, 8, 2)

  # Numerical check of the first conv block layer against torch:
  # zero-SAME conv + leaky relu (reference ConvBlock semantics)
  tw = sd['conv_blocks.0.layers.1.weight']
  tb = sd['conv_blocks.0.layers.1.bias']
  tx = torch.from_numpy(
      np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())
  want = torch.nn.functional.leaky_relu(
      torch.nn.functional.conv2d(tx, tw, tb, padding=1), 0.01)
  want = want.numpy().transpose(0, 2, 3, 1)

  kernel = restored['block_0']['conv_0']['kernel']
  got = jax.lax.conv_general_dilated(
      x, kernel, (1, 1), [(1, 1), (1, 1)],
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  got = jax.nn.leaky_relu(got + restored['block_0']['conv_0']['bias'], 0.01)
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _unet_state_dict(rng, num_layers=1, encode=(4, 8), decode=(4,),
                     use_bn=True, mode='nn-resize-conv', act_up_only=True):
  """Synthetic reference-named UNET state dict for the converter."""
  sd = {}
  stride = 2 + (1 if use_bn else 0) + 1  # pad, conv, bn?, act

  def add_conv(prefix, c_in, c_out, k=3, bias=True):
    sd[prefix + '.weight'] = torch.from_numpy(
        rng.randn(c_out, c_in, k, k).astype(np.float32))
    if bias:
      sd[prefix + '.bias'] = torch.from_numpy(
          rng.randn(c_out).astype(np.float32))

  def add_bn(prefix, c):
    sd[prefix + '.weight'] = torch.ones(c)
    sd[prefix + '.bias'] = torch.zeros(c)
    sd[prefix + '.running_mean'] = torch.zeros(c)
    sd[prefix + '.running_var'] = torch.ones(c)

  c_in = 2
  for s, c in enumerate(encode):
    for j in range(num_layers):
      idx = j * stride + 1
      add_conv('encode_units.{}.encode.{}'.format(s, idx), c_in, c,
               bias=not use_bn)
      if use_bn:
        add_bn('encode_units.{}.encode.{}'.format(s, idx + 1), c)
      c_in = c

  # one concat decode unit, nn-resize-conv: upsample [up(0), pad(1), conv(2),
  # bn(3), act(4)] with act_upsampling_only
  add_conv('concat_decode_units.0.upsample.2', encode[-1], decode[0],
           bias=not use_bn)
  if use_bn and act_up_only:
    add_bn('concat_decode_units.0.upsample.3', decode[0])
  # decode tail: ConvEncodeUnit at decode.0 (act_upsampling_only)
  cat_c = decode[0] + encode[-2]
  for j in range(num_layers):
    idx = j * stride + 1
    add_conv('concat_decode_units.0.decode.0.encode.{}'.format(idx),
             cat_c, decode[0], bias=not use_bn)
    if use_bn:
      add_bn('concat_decode_units.0.decode.0.encode.{}'.format(idx + 1),
             decode[0])
    cat_c = decode[0]

  add_conv('head.0', decode[0], 1, k=1)
  return sd


def test_unet_conversion_structure(rng):
  sd = _unet_state_dict(rng)
  converted = torch_import.convert_unet(
      sd, num_layers_per_scale=1, encode_filters=[4, 8],
      decode_filters=[4], use_bn=True, upsampling_mode='nn-resize-conv',
      decoder_act_upsampling_only=True)

  model = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=1,
               encode_filters=[4, 8], decode_filters=[4],
               output_activation='none', use_bn=True,
               upsampling_mode='nn-resize-conv',
               decoder_act_upsampling_only=True)
  x = jnp.zeros((1, 8, 8, 2))
  variables = model.init(jax.random.PRNGKey(0), x, train=False)

  restored_p = serialization.from_state_dict(variables['params'],
                                             converted['params'])
  restored_s = serialization.from_state_dict(variables['batch_stats'],
                                             converted['batch_stats'])
  out = model.apply({'params': restored_p, 'batch_stats': restored_s}, x,
                    train=False)
  assert out.shape == (1, 8, 8, 1)


def test_conv_transpose_conversion_matches_torch(rng):
  """torch ConvTranspose2d(k=2, s=2) ≡ flax ConvTranspose with converted
  weights."""
  import flax.linen as nn
  w = rng.randn(3, 5, 2, 2).astype(np.float32)  # torch IOHW: in=3, out=5
  x = rng.randn(1, 4, 4, 3).astype(np.float32)

  tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
  want = torch.nn.functional.conv_transpose2d(
      tx, torch.from_numpy(w), stride=2).numpy().transpose(0, 2, 3, 1)

  kernel = torch_import._convt_w(torch.from_numpy(w))
  conv = nn.ConvTranspose(5, (2, 2), strides=(2, 2), padding='VALID',
                          use_bias=False)
  variables = {'params': {'kernel': jnp.asarray(kernel.copy())}}
  got = conv.apply(variables, jnp.asarray(x))
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_discriminator_conversion_structure(rng):
  sd = {}

  def add_conv(prefix, c_in, c_out, k, bias=True):
    sd[prefix + '.weight'] = torch.from_numpy(
        rng.randn(c_out, c_in, k, k).astype(np.float32))
    if bias:
      sd[prefix + '.bias'] = torch.from_numpy(
          rng.randn(c_out).astype(np.float32))

  # layer 0: [pad(0), conv(1), act(2)]  (not-first: no norm)
  add_conv('convs.1', 1, 4, 4)
  # layer 1: [pad(3), conv(4), bn(5), act(6)]
  add_conv('convs.4', 4, 8, 4, bias=False)
  sd['convs.5.weight'] = torch.ones(8)
  sd['convs.5.bias'] = torch.zeros(8)
  sd['convs.5.running_mean'] = torch.zeros(8)
  sd['convs.5.running_var'] = torch.ones(8)
  add_conv('final_conv.0', 8, 1, 4)

  converted = torch_import.convert_discriminator(
      sd, num_filters_per_layer=[4, 8], use_norm_layers='not-first',
      norm_layer='batch')

  model = CNNDiscriminator(num_inputs=1, num_filters_per_layer=[4, 8],
                           strides=[2, 2], kernel_sizes=4,
                           final_conv_kernel_size=4,
                           use_norm_layers='not-first', norm_layer='batch')
  x = jnp.zeros((1, 16, 16, 1))
  variables = model.init(
      {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
      x, train=False)
  restored_p = serialization.from_state_dict(variables['params'],
                                             converted['params'])
  restored_s = serialization.from_state_dict(variables['batch_stats'],
                                             converted['batch_stats'])
  out = model.apply({'params': restored_p, 'batch_stats': restored_s}, x,
                    train=False)
  assert out['logits'].shape[0] == 1


def test_convert_reference_checkpoint_file(rng, tmp_path):
  """End-to-end: torch-saved checkpoint file → our checkpoint → grafted
  into a runner-compatible tree."""
  sd = _recnet_state_dict(rng)
  ckpt = {'conf': {'dummy': 1}, 'runner': {'model': sd}, 'epoch': 7}
  torch_path = str(tmp_path / 'ref.pth')
  torch.save(ckpt, torch_path)

  out_path = str(tmp_path / 'converted.ckpt')
  torch_import.convert_reference_checkpoint(
      torch_path, out_path,
      {'model': ('recnet', {'num_blocks': 2, 'num_convs': 2})})

  from csmri_refinement_tpu.utils.checkpoints import load_model_state_dict
  loaded = load_model_state_dict(out_path, 'model')
  assert 'params' in loaded
  assert 'block_0' in loaded['params']
  kernel = np.asarray(loaded['params']['block_0']['conv_0']['kernel'])
  assert kernel.shape == (3, 3, 2, 4)  # HWIO


def test_checkpoint_cli_config_driven(rng, tmp_path):
  """--checkpoint CONFIG IN OUT derives the architecture from the config
  and writes a checkpoint validate.py can restore."""
  import json

  conf = {
      'seed': 0,
      'runner_type': 'standard',
      'model': {'name': 'RecNet', 'num_blocks': 2, 'num_convs': 2,
                'num_filters': 4},
  }
  conf_path = str(tmp_path / 'conf.json')
  with open(conf_path, 'w') as f:
    json.dump(conf, f)

  sd = _recnet_state_dict(rng)
  ckpt = {'conf': {'dummy': 1}, 'runner': {'model': sd, 'optimizer': {}},
          'epoch': 3}
  torch_path = str(tmp_path / 'ref.pth')
  torch.save(ckpt, torch_path)

  out_path = str(tmp_path / 'converted.ckpt')
  torch_import.main(['--checkpoint', conf_path, torch_path, out_path])

  from csmri_refinement_tpu.utils.checkpoints import load_model_state_dict
  loaded = load_model_state_dict(out_path, 'model')
  model = RecNet(num_blocks=2, num_convs=2, num_filters=4)
  inp = jnp.zeros((1, 8, 8, 2))
  variables = model.init(jax.random.PRNGKey(0), inp, inp,
                         jnp.ones((1, 8, 8, 1)))
  restored = serialization.from_state_dict(variables['params'],
                                           loaded['params'])
  out = model.apply({'params': restored}, inp, inp, jnp.ones((1, 8, 8, 1)))
  assert out.shape == (1, 8, 8, 2)
  # Converted conv_0 kernel must equal the torch OIHW weight transposed
  w_torch = sd['conv_blocks.0.layers.1.weight'].numpy()
  np.testing.assert_allclose(np.asarray(restored['block_0']['conv_0']
                                        ['kernel']),
                             w_torch.transpose(2, 3, 1, 0))


def test_specs_from_flagship_config():
  """The shipped flagship config maps to refinement_wrapper + discriminator
  specs with the paper architecture."""
  from csmri_refinement_tpu.utils.config import Configuration

  conf = Configuration.from_json('configs/2-refinement.json')
  specs = torch_import.specs_from_config(conf)
  assert set(specs) == {'generator', 'discriminator'}
  kind, kwargs = specs['generator']
  assert kind == 'refinement_wrapper'
  assert kwargs['recnet_kwargs'] == {'num_blocks': 3, 'num_convs': 3}
  assert kwargs['unet_kwargs']['encode_filters'] == [32, 64, 128]
  assert kwargs['unet_kwargs']['upsampling_mode'] == 'nn-resize-conv'
  assert kwargs['unet_kwargs']['decoder_act_upsampling_only'] is True
  kind, kwargs = specs['discriminator']
  assert kind == 'discriminator'
  assert kwargs['num_filters_per_layer'] == [64, 128, 256, 512, 1024, 1024]
  assert not kwargs['fc_layers']


def test_deployed_checkpoint_skips_missing_keys(rng, tmp_path, capsys):
  """A deployed (generator-only) reference checkpoint converts without the
  discriminator key present."""
  import json

  conf = {
      'seed': 0,
      'runner_type': 'adversarial',
      'generator_model': {'name': 'RecNet', 'num_blocks': 2, 'num_convs': 2,
                          'num_filters': 4},
      'discriminator_model': {'num_inputs': 1,
                              'num_filters_per_layer': [4, 8],
                              'strides': [2, 2]},
  }
  conf_path = str(tmp_path / 'conf.json')
  with open(conf_path, 'w') as f:
    json.dump(conf, f)

  sd = _recnet_state_dict(rng)
  torch_path = str(tmp_path / 'deployed.pth')
  torch.save({'runner': {'generator': sd}, 'epoch': 9}, torch_path)

  out_path = str(tmp_path / 'converted.ckpt')
  torch_import.main(['--checkpoint', conf_path, torch_path, out_path])
  assert 'skipped' in capsys.readouterr().out

  from csmri_refinement_tpu.utils.checkpoints import load_model_state_dict
  loaded = load_model_state_dict(out_path, 'generator')
  assert 'block_0' in loaded['params']


@pytest.mark.e2e
def test_flagship_checkpoint_cli_to_validate_parity(tmp_path):
  """The advertised migration path, end-to-end at flagship scale
  (VERDICT r4 #6): a reference-shaped GAN training checkpoint (paper
  architecture: RecNet 3x3x32 + refinement U-Net [32,64,128]/[64,32] +
  PatchGAN disc, reference adversarial_runner.py:236-242 state-dict
  layout) converts via the config-driven CLI, drives validate.py, and
  the validated PSNR/SSIM match the torch twin's own forward on the
  SAME fixed validation masks within the repo parity budget
  (0.1 dB / 0.001 SSIM)."""
  import json

  import torch_twins
  import validate as validate_cli
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  from csmri_refinement_tpu.metrics import get_metric_fn
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils.checkpoints import restore_checkpoint
  from csmri_refinement_tpu.utils.config import Configuration

  size, batch = 64, 4
  unet_kwargs = dict(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
                     encode_filters=[32, 64, 128], decode_filters=[64, 32],
                     kernel_size=4, upsampling_mode='nn-resize-conv',
                     output_activation='none', padding='reflection',
                     decoder_act_upsampling_only=True)
  torch.manual_seed(11)
  tm = torch_twins.TorchRefinementWrapper(
      torch_twins.TorchRecNet(num_blocks=3, num_convs=3, num_filters=32),
      torch_twins.TorchUNET(**unet_kwargs),
      mode='real-penalty-add', input_mode='output')
  tm.scale.data.fill_(0.3)  # nonzero so the residual path matters
  tm.eval()
  disc = torch_twins.TorchCNNDiscriminator(
      num_inputs=1, num_filters_per_layer=[8, 16], strides=[2, 2],
      kernel_sizes=4, final_conv_kernel_size=4, padding='reflection',
      use_norm_layers='not-first', norm_layer='batch',
      compute_features=True)

  # Reference-shaped training checkpoint (full runner state incl. disc)
  torch_path = str(tmp_path / 'ref_flagship.pth')
  torch.save({'conf': {'from': 'reference'},
              'runner': {'generator': tm.state_dict(),
                         'discriminator': disc.state_dict()},
              'epoch': 5}, torch_path)

  conf_dict = {
      'seed': 0,
      'runner_type': 'adversarial',
      'application': 'reconstruction',
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': size, 'num_train': 8, 'num_val': 8},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 4,
                        'variable_acceleration': False},
      'generator_model': {
          'name': 'RefinementWrapper',
          'mode': 'real-penalty-add',
          'input_mode': 'output',
          'pretrained_model': {'name': 'RecNet', 'num_blocks': 3,
                               'num_convs': 3, 'num_filters': 32},
          'learnable_model': dict(unet_kwargs, name='UNET'),
      },
      'discriminator_model': {
          'num_inputs': 1, 'input_method': 'simple-magnitude',
          'num_filters_per_layer': [8, 16], 'strides': [2, 2],
          'kernel_sizes': 4, 'final_conv_kernel_size': 4,
          'padding': 'reflection', 'use_norm_layers': 'not-first',
          'norm_layer': 'batch', 'compute_features': True,
      },
      'batch_size': batch,
      'validation_metrics': ['psnr', 'ssim'],
  }
  conf_path = str(tmp_path / 'flagship.json')
  with open(conf_path, 'w') as f:
    json.dump(conf_dict, f)

  # 1. Convert via the CLI (architecture derived from the config)
  out_path = str(tmp_path / 'converted.ckpt')
  torch_import.main(['--checkpoint', conf_path, torch_path, out_path])

  # 2. The converted checkpoint drives validate.py end-to-end
  validate_cli.main([conf_path, out_path, '--dry',
                     '--batch-size', str(batch)])

  # 3. Numerical parity: validate through a runner, then score the torch
  # twin on the SAME deterministic validation batches with the SAME
  # metric functions.
  conf = Configuration.from_json(conf_path)
  runner = build_runner(conf, 'adversarial', mode='test')
  restore_checkpoint(out_path, runner)
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  _, _, val_metrics = runner.validate(
      DataLoader(val_set, batch, shuffle=False))

  psnr_fn = get_metric_fn(conf, 'psnr', 'test')
  ssim_fn = get_metric_fn(conf, 'ssim', 'test')
  twin = {}
  for host_batch in DataLoader(val_set, batch, shuffle=False):
    prepared = runner.preparer.prepare_val(host_batch)
    inp = np.asarray(prepared['inp'])
    ksp = np.asarray(prepared['kspace'])
    mask = np.asarray(prepared['mask'])
    target = np.asarray(prepared['target'])
    with torch.no_grad():
      t_out = tm(torch.from_numpy(inp.transpose(0, 3, 1, 2).copy()),
                 torch.from_numpy(ksp.transpose(0, 3, 1, 2).copy()),
                 torch.from_numpy(mask.transpose(0, 3, 1, 2).copy()))
    t_pred = t_out['pred'].numpy().transpose(0, 2, 3, 1)
    for name, fn in (('psnr', psnr_fn), ('ssim', ssim_fn)):
      m = fn({'pred': t_pred}, target)
      if name in twin:
        twin[name].accumulate(m)
      else:
        twin[name] = m

  got_psnr = val_metrics['gen_psnr'].value
  got_ssim = val_metrics['gen_ssim'].value
  assert abs(got_psnr - twin['psnr'].value) < 0.1, \
      (got_psnr, twin['psnr'].value)
  assert abs(got_ssim - twin['ssim'].value) < 0.001, \
      (got_ssim, twin['ssim'].value)
  # Sanity: the converted cascade actually reconstructs (beats garbage)
  assert got_psnr > 20.0
