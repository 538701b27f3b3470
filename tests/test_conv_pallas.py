"""Fused Pallas conv-chain kernel vs the XLA SAME-conv reference.

Interpret-mode (CPU) equivalence of ops/conv_pallas.fused_conv_chain
against same_pad + lax.conv for every packing regime the flagship models
hit: P=4/2/1 (C=32/64/128), k in {3,4}, all three pad modes, multi-layer
chains incl. the P-repack path, bias and LeakyReLU epilogues.

The same cases were verified compiled on the real v5e (scripts + NOTES
round 3); interpret mode keeps the coverage in the CPU suite. Small
images (8x8) keep the interpreter tractable; width-edge fixup logic is
exercised at every group boundary regardless of size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.models.layers import same_pad
from csmri_refinement_tpu.ops.conv_pallas import ChainLayer, fused_conv_chain

pytestmark = [pytest.mark.slow, pytest.mark.parity]


def ref_chain(x, layers, pad_mode):
  for lay in layers:
    k = lay.kernel.shape[0]
    xp = same_pad(x, k, 1, pad_mode)
    x = jax.lax.conv_general_dilated(
        xp, lay.kernel.astype(x.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if lay.bias is not None:
      x = x + lay.bias.astype(x.dtype)
    if lay.leakiness is not None:
      x = jnp.where(x >= 0, x, jnp.asarray(lay.leakiness, x.dtype) * x)
  return x


def _mk(rng, k, cin, cout, leak=0.2):
  w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32)) * 0.2
  b = jnp.asarray(rng.randn(cout).astype(np.float32))
  return ChainLayer(w, b, leak)


CASES = {
    'k4_c32_reflect': ((4, 32, 32),),
    'k4_c32_zero': ((4, 32, 32),),
    'k4_c32_repl': ((4, 32, 32),),
    'k3_c32': ((3, 32, 32),),
    'k4_c64_p2': ((4, 64, 64),),
    'k4_c128_p1': ((4, 128, 128),),
    'k3_c128_p1': ((3, 128, 128),),
    'chain_32_64_64': ((4, 32, 64), (4, 64, 64)),
    'chain_64_32_32': ((4, 64, 32), (4, 32, 32)),
    'k4_c128_to_64': ((4, 128, 64),),
    'linear_no_bias': ((4, 32, 32),),
}
_MODES = {'k4_c32_zero': 'zero', 'k4_c32_repl': 'replication',
          'k3_c128_p1': 'zero'}


@pytest.mark.parametrize('case', sorted(CASES))
def test_fused_chain_matches_xla(case):
  rng = np.random.RandomState(hash(case) % 2**31)
  specs = CASES[case]
  layers = tuple(_mk(rng, *s) for s in specs)
  if case == 'linear_no_bias':
    layers = (layers[0]._replace(bias=None, leakiness=None),)
  mode = _MODES.get(case, 'reflection')
  cin = specs[0][1]
  x = jnp.asarray(rng.randn(2, 8, 8, cin).astype(np.float32))
  want = ref_chain(x, layers, mode)
  got = fused_conv_chain(x, layers, pad_mode=mode, interpret=True)
  assert got.shape == want.shape
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0, atol=2e-4)


def test_chain_p_never_increases():
  """Mosaic rejects lane-merging repacks; the plan must only split."""
  from csmri_refinement_tpu.ops.conv_pallas import _plan
  rng = np.random.RandomState(0)
  layers = (_mk(rng, 4, 64, 32), _mk(rng, 4, 32, 32))
  plans = _plan(layers, 256, 'reflection')
  assert [lp.p for lp in plans] == [4, 4]   # 64->32 widened to P=4
  layers = (_mk(rng, 4, 32, 64), _mk(rng, 4, 64, 64))
  plans = _plan(layers, 256, 'reflection')
  assert [lp.p for lp in plans] == [4, 2]   # split repack allowed


def test_chain_forward_splits_stem():
  """chain_forward runs sub-32-channel stems via XLA, fuses the rest."""
  rng = np.random.RandomState(7)
  layers = (_mk(rng, 4, 2, 32), _mk(rng, 4, 32, 32))
  x = jnp.asarray(rng.randn(2, 16, 64, 2).astype(np.float32))
  from csmri_refinement_tpu.ops.conv_pallas import chain_forward
  got = chain_forward(x, layers, pad_mode='reflection', interpret=True)
  want = ref_chain(x, layers, 'reflection')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0, atol=2e-4)


def test_unet_fused_inference_equivalence():
  """UNET(fused_inference=True) == UNET(False) in eval mode (BN folded).

  Flagship-shaped (encode [32,64,128]) so the C>=128 fusion policy
  actually engages on the s2 chain."""
  from csmri_refinement_tpu.models.unet import UNET
  rng = np.random.RandomState(3)
  kw = dict(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
            encode_filters=[32, 64, 128], decode_filters=[64, 32],
            kernel_size=4,
            upsampling_mode='nn-resize-conv', output_activation='none',
            padding='reflection', decoder_act_upsampling_only=True)
  x = jnp.asarray(rng.randn(2, 64, 64, 2).astype(np.float32))
  model = UNET(**kw)
  variables = model.init(jax.random.PRNGKey(0), x, train=False)
  # perturb running stats so BN folding is actually exercised
  import flax
  stats = flax.core.unfreeze(variables['batch_stats'])
  leaves, treedef = jax.tree_util.tree_flatten(stats)
  keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
  leaves = [jnp.abs(l + 0.3 * jax.random.normal(k, l.shape)) + 0.05
            for l, k in zip(leaves, keys)]
  variables = {'params': variables['params'],
               'batch_stats': jax.tree_util.tree_unflatten(treedef, leaves)}
  want = model.apply(variables, x, train=False)
  fused = UNET(fused_inference=True, **kw)
  got = fused.apply(variables, x, train=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0, atol=5e-4)


def test_int8_chain_quality():
  """int8 serving mode: quantized chain tracks f32 within 8-bit error."""
  from csmri_refinement_tpu.ops.quantize import chain_forward_int8
  from csmri_refinement_tpu.ops.conv_pallas import chain_forward
  rng = np.random.RandomState(11)
  layers = (_mk(rng, 4, 32, 32), _mk(rng, 4, 32, 32))
  x = jnp.asarray(rng.randn(2, 16, 64, 32).astype(np.float32))
  want = np.asarray(chain_forward(x, layers, pad_mode='reflection',
                                  interpret=True))
  got = np.asarray(chain_forward_int8(x, layers, pad_mode='reflection',
                                      interpret=True))
  assert got.shape == want.shape
  denom = np.abs(want).max()
  rel = np.abs(got - want).max() / denom
  assert rel < 0.04, 'int8 relative error too large: {}'.format(rel)
  # and it must NOT be bit-identical (the quantization actually ran)
  assert np.abs(got - want).max() > 0


def test_unet_quantized_inference_mode():
  """UNET(quantize_inference=True) is close to, not identical to, f32."""
  from csmri_refinement_tpu.models.unet import UNET
  rng = np.random.RandomState(4)
  kw = dict(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
            encode_filters=[32, 64], decode_filters=[32], kernel_size=4,
            upsampling_mode='nn-resize-conv', output_activation='none',
            padding='reflection', decoder_act_upsampling_only=True)
  x = jnp.asarray(rng.randn(2, 64, 64, 2).astype(np.float32))
  model = UNET(**kw)
  variables = model.init(jax.random.PRNGKey(0), x, train=False)
  want = np.asarray(model.apply(variables, x, train=False))
  qmodel = UNET(quantize_inference=True, **kw)
  got = np.asarray(qmodel.apply(variables, x, train=False))
  rel = np.abs(got - want).max() / np.abs(want).max()
  assert rel < 0.05, rel
  assert np.abs(got - want).max() > 0
