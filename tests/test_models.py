"""UNET / CNNDiscriminator / VGG19 / RefinementWrapper model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.models.unet import UNET, UPSAMPLING_MODES
from csmri_refinement_tpu.models.discriminators import CNNDiscriminator
from csmri_refinement_tpu.models.vgg import VGG19
from csmri_refinement_tpu.models.recnet import RecNet
from csmri_refinement_tpu.models.refinement_wrapper import (

    RefinementWrapper, _scale, _unscale)

# Heavyweight end-to-end/architecture tests: deselect with -m "not slow"
pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _init_apply(model, *inputs, train=False, **kwargs):
  variables = model.init(
      {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
      *inputs, train=train, **kwargs)
  out = model.apply(variables, *inputs, train=train,
                    rngs={'dropout': jax.random.PRNGKey(2)},
                    mutable=['batch_stats'] if train else False, **kwargs)
  if train:
    out = out[0]
  return variables, out


@pytest.mark.parametrize('mode', UPSAMPLING_MODES)
def test_unet_upsampling_modes(mode):
  model = UNET(num_inputs=2, num_outputs=2, num_layers_per_scale=1,
               encode_filters=[4, 8], decode_filters=[4],
               output_activation='none', upsampling_mode=mode, use_bn=False)
  x = jnp.ones((1, 16, 16, 2))
  _, out = _init_apply(model, x)
  assert out.shape == (1, 16, 16, 2)


def test_unet_config2_architecture():
  """The refinement U-Net from configs/2-refinement.json."""
  model = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
               encode_filters=[32, 64, 128], decode_filters=[64, 32],
               kernel_size=4, upsampling_mode='nn-resize-conv',
               output_activation='none', padding='reflection',
               decoder_act_upsampling_only=True)
  x = jnp.ones((2, 32, 32, 2))
  variables, out = _init_apply(model, x, train=True)
  assert out.shape == (2, 32, 32, 1)
  assert 'batch_stats' in variables


def test_unet_segmentation_architecture():
  """The segmentation U-Net from configs/3-train-segmentation-unet.json."""
  model = UNET(num_inputs=2, num_outputs=2, num_layers_per_scale=2,
               encode_filters=[32, 64, 128, 256, 512],
               decode_filters=[256, 128, 64, 32], use_bn=True,
               upsampling_mode='pixelshuffle', padding='reflection',
               output_activation='none')
  x = jnp.ones((1, 64, 64, 2))
  _, out = _init_apply(model, x)
  assert out.shape == (1, 64, 64, 2)


def test_unet_odd_input_padding():
  """Decode path pads to the encoder feature size for odd inputs
  (reference _pad_to_target, unet.py:27-34)."""
  model = UNET(num_inputs=1, num_outputs=1, num_layers_per_scale=1,
               encode_filters=[4, 8], decode_filters=[4],
               output_activation='none', use_bn=False)
  x = jnp.ones((1, 15, 15, 1))
  _, out = _init_apply(model, x)
  assert out.shape == (1, 15, 15, 1)


def test_unet_encoder_features():
  model = UNET(num_inputs=1, num_outputs=1, num_layers_per_scale=1,
               encode_filters=[4, 8], decode_filters=[4],
               output_activation='none', use_bn=False,
               encoder_features=[0, 1])
  x = jnp.ones((1, 16, 16, 1))
  _, out = _init_apply(model, x)
  assert isinstance(out, dict)
  assert out['pred'].shape == (1, 16, 16, 1)
  assert len(out['features']) == 2
  assert out['features'][0].shape == (1, 16, 16, 4)
  assert out['features'][1].shape == (1, 8, 8, 8)


def test_discriminator_patchgan():
  """The discriminator from configs/2-refinement.json (downscaled)."""
  model = CNNDiscriminator(
      num_inputs=1, num_filters_per_layer=[8, 16, 32, 32],
      strides=[2, 2, 2, 1], kernel_sizes=4, final_conv_kernel_size=4,
      padding='reflection', act_fn='lrelu', relu_leakiness=0.2,
      dropout_after=[2, 3], dropout_prob=0.5, use_norm_layers='not-first',
      norm_layer='batch', compute_features=True)
  x = jnp.ones((2, 64, 64, 1))
  variables, out = _init_apply(model, x, train=True)
  assert set(out.keys()) == {'prob', 'logits', 'features'}
  # 64 → 32 → 16 → 8 (stride1) → final 4x4 conv VALID: 8-3=5
  assert out['logits'].shape == (2, 5, 5, 1)
  assert np.all(np.asarray(out['prob']) >= 0)
  assert np.all(np.asarray(out['prob']) <= 1)
  assert len(out['features']) == 5  # 4 act maps + final conv
  # First conv has bias (not-first norm), later convs don't (batch norm)
  params = variables['params']
  assert 'bias' in params['conv_0']
  assert 'bias' not in params['conv_1']


def test_discriminator_fc_head():
  model = CNNDiscriminator(num_inputs=1, num_filters_per_layer=[4, 8],
                           strides=[2, 2], kernel_sizes=3, fc_layers=[16, 1],
                           use_norm_layers=False)
  x = jnp.ones((2, 16, 16, 1))
  _, out = _init_apply(model, x)
  assert out['logits'].shape == (2, 1)


def test_discriminator_dropout_active_in_train():
  model = CNNDiscriminator(num_inputs=1, num_filters_per_layer=[4],
                           strides=[1], kernel_sizes=3, dropout_after=[0],
                           dropout_prob=0.9, use_norm_layers=False)
  x = jnp.ones((1, 8, 8, 1))
  variables = model.init(
      {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
      x, train=False)
  out1 = model.apply(variables, x, train=True,
                     rngs={'dropout': jax.random.PRNGKey(2)})
  out2 = model.apply(variables, x, train=True,
                     rngs={'dropout': jax.random.PRNGKey(3)})
  assert not np.allclose(np.asarray(out1['logits']),
                         np.asarray(out2['logits']))
  # Eval is deterministic
  out3 = model.apply(variables, x, train=False)
  out4 = model.apply(variables, x, train=False)
  np.testing.assert_array_equal(np.asarray(out3['logits']),
                                np.asarray(out4['logits']))


def test_vgg19_blocks():
  model = VGG19(output_blocks=(0, 2, 4))
  x = jnp.ones((1, 64, 64, 3))
  variables = model.init(jax.random.PRNGKey(0), x)
  out = model.apply(variables, x)
  assert len(out) == 3
  assert out[0].shape == (1, 64, 64, 64)      # block0: 64ch, full res
  assert out[1].shape == (1, 16, 16, 256)     # block2: 256ch, /4
  assert out[2].shape == (1, 4, 4, 512)       # block4: 512ch, /16
  # blocks 0-4 span all 16 convs of VGG19 (2+2+4+4+4)
  n_convs = len([k for k in variables['params'] if k.startswith('conv_')])
  assert n_convs == 16


def test_scale_unscale_roundtrip():
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
  scaled, mn, mx = _scale(x)
  assert float(jnp.min(scaled)) >= -1.0 - 1e-5
  assert float(jnp.max(scaled)) <= 1.0 + 1e-5
  back = _unscale(scaled, mn, mx)
  np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def _make_wrapper(mode='real-penalty-add'):
  pretrained = RecNet(num_blocks=1, num_convs=2, num_filters=4)
  learnable = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=1,
                   encode_filters=[4, 8], decode_filters=[4],
                   output_activation='none', use_bn=False)
  return RefinementWrapper(pretrained_model=pretrained,
                           learnable_model=learnable, mode=mode,
                           input_mode='output')


def test_refinement_wrapper_outputs():
  model = _make_wrapper()
  assert model.INPUT_KEYS == ('inp', 'kspace', 'mask')
  inp = jnp.ones((2, 16, 16, 2)) * 0.5
  kspace = jnp.zeros((2, 16, 16, 2))
  mask = jnp.zeros((2, 16, 16, 1))
  variables = model.init(jax.random.PRNGKey(0), inp, kspace, mask)
  out = model.apply(variables, inp, kspace, mask)
  assert set(out.keys()) == {'pred', 'pretrained', 'prescaled_refinement',
                             'scaled_refinement'}
  assert out['pred'].shape == (2, 16, 16, 2)
  # scale param initialized to zero → scaled refinement is exactly zero and
  # pred equals the (rescaled) pretrained output
  np.testing.assert_allclose(np.asarray(out['scaled_refinement']), 0.0)
  # Imaginary channel passes through the pretrained output
  np.testing.assert_allclose(np.asarray(out['pred'][..., 1]),
                             np.asarray(out['pretrained'][..., 1]),
                             atol=1e-6)


def test_refinement_wrapper_freezes_pretrained():
  """Gradients w.r.t. the pretrained subtree must be exactly zero."""
  model = _make_wrapper()
  inp = jnp.ones((1, 16, 16, 2)) * 0.3
  kspace = jnp.zeros((1, 16, 16, 2))
  mask = jnp.zeros((1, 16, 16, 1))
  variables = model.init(jax.random.PRNGKey(0), inp, kspace, mask)

  def loss(params):
    out = model.apply({'params': params}, inp, kspace, mask)
    return jnp.sum(out['pred'] ** 2)

  grads = jax.grad(loss)(variables['params'])
  pretrained_norms = [float(jnp.abs(g).max()) for g in
                      jax.tree_util.tree_leaves(grads['pretrained_model'])]
  assert all(n == 0.0 for n in pretrained_norms)
  # At init scale==0, so the learnable path receives gradient only through
  # the scale parameter (faithful to the reference's zero-init scale)
  assert float(jnp.abs(grads['scale']).max()) > 0.0

  # With a nonzero scale, gradients reach the learnable model while the
  # pretrained model stays frozen
  params2 = dict(variables['params'])
  params2['scale'] = jnp.ones((1,))
  grads2 = jax.grad(loss)(params2)
  learnable_norms = [float(jnp.abs(g).max()) for g in
                     jax.tree_util.tree_leaves(grads2['learnable_model'])]
  pretrained_norms2 = [float(jnp.abs(g).max()) for g in
                       jax.tree_util.tree_leaves(grads2['pretrained_model'])]
  assert any(n > 0.0 for n in learnable_norms)
  assert all(n == 0.0 for n in pretrained_norms2)


def test_unet_remat_matches_plain():
  """remat recomputes activations but must not change values/gradients."""
  x = jnp.ones((1, 16, 16, 2)) * 0.5
  plain = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=1,
               encode_filters=[4, 8], decode_filters=[4],
               output_activation='none', use_bn=False)
  rematted = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=1,
                  encode_filters=[4, 8], decode_filters=[4],
                  output_activation='none', use_bn=False, remat=True)
  variables = plain.init(jax.random.PRNGKey(0), x)
  out_p = plain.apply(variables, x)
  out_r = rematted.apply(variables, x)
  np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                             atol=1e-6)

  gp = jax.grad(lambda p: jnp.sum(plain.apply({'params': p}, x) ** 2))(
      variables['params'])
  gr = jax.grad(lambda p: jnp.sum(rematted.apply({'params': p}, x) ** 2))(
      variables['params'])
  for a, b in zip(jax.tree_util.tree_leaves(gp),
                  jax.tree_util.tree_leaves(gr)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_discriminator_final_layer_bias_init():
  model = CNNDiscriminator(num_inputs=1, num_filters_per_layer=[4],
                           strides=[1], kernel_sizes=3,
                           use_norm_layers=False,
                           weight_init={'final_layer_bias':
                                        ('constant', -2.5)})
  x = jnp.ones((1, 8, 8, 1))
  variables = model.init(
      {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
      x, train=False)
  np.testing.assert_allclose(
      np.asarray(variables['params']['final_conv']['bias']), -2.5)


def test_split_merge_conv_equals_concat(monkeypatch, rng):
  """The unmaterialized skip-merge lowering (_SplitSumConv) is exactly the
  concat+conv it replaces: same parameter tree, same outputs."""
  from csmri_refinement_tpu.models import unet as unet_mod

  model = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
               encode_filters=[8, 16, 32], decode_filters=[16, 8],
               kernel_size=4, upsampling_mode='nn-resize-conv',
               output_activation='none', padding='reflection',
               decoder_act_upsampling_only=True)
  x = jnp.asarray(rng.randn(2, 32, 32, 2).astype(np.float32))

  monkeypatch.setattr(unet_mod, '_SPLIT_MERGE_CONV', True)
  variables = model.init(jax.random.PRNGKey(0), x)
  y_split = model.apply(variables, x)

  monkeypatch.setattr(unet_mod, '_SPLIT_MERGE_CONV', False)
  variables_dense = model.init(jax.random.PRNGKey(0), x)
  # identical parameter trees (names, shapes, values)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
      variables, variables_dense)
  y_dense = model.apply(variables, x)

  np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_dense),
                             atol=2e-5)


def test_split_merge_conv_equals_concat_with_bn_train(monkeypatch, rng):
  """Split path under use_bn + train mode (mutable batch_stats)."""
  from csmri_refinement_tpu.models import unet as unet_mod

  model = UNET(num_inputs=2, num_outputs=2, num_layers_per_scale=1,
               encode_filters=[8, 16], decode_filters=[8],
               kernel_size=3, upsampling_mode='transposed',
               output_activation='none', use_bn=True,
               decoder_act_upsampling_only=True)
  x = jnp.asarray(rng.randn(2, 16, 16, 2).astype(np.float32))

  outs = {}
  for flag in (True, False):
    monkeypatch.setattr(unet_mod, '_SPLIT_MERGE_CONV', flag)
    variables = model.init(jax.random.PRNGKey(1), x)
    y, mut = model.apply(variables, x, train=True,
                         mutable=['batch_stats'])
    outs[flag] = (y, mut)
  np.testing.assert_allclose(np.asarray(outs[True][0]),
                             np.asarray(outs[False][0]), atol=2e-5)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              atol=2e-5),
      outs[True][1], outs[False][1])
