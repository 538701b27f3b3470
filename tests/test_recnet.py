"""RecNet model tests: shapes, DC behavior, init system, scan equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from csmri_refinement_tpu.models.recnet import RecNet, construct_model
from csmri_refinement_tpu.ops import masks as mask_ops
import csmri_refinement_tpu.ops.undersample as us_ops
from csmri_refinement_tpu.utils.config import Configuration


def _batch(key, b=2, hw=16):
  gt = jax.random.uniform(jax.random.PRNGKey(5), (b, hw, hw))
  return us_ops.undersample_batch(key, gt, 'varden', 2)


def test_recnet_forward_shape():
  model = RecNet(num_blocks=3, num_convs=3, num_filters=8)
  batch = _batch(jax.random.PRNGKey(0))
  variables = model.init(jax.random.PRNGKey(1), batch['inp'],
                         batch['kspace'], batch['mask'])
  out = model.apply(variables, batch['inp'], batch['kspace'], batch['mask'])
  assert out.shape == (2, 16, 16, 2)
  assert out.dtype == jnp.float32


def test_recnet_output_satisfies_data_consistency():
  """Output k-space must equal k0 on sampled lines (the final DC layer)."""
  model = RecNet(num_blocks=2, num_convs=2, num_filters=4)
  batch = _batch(jax.random.PRNGKey(2))
  variables = model.init(jax.random.PRNGKey(3), batch['inp'],
                         batch['kspace'], batch['mask'])
  out = model.apply(variables, batch['inp'], batch['kspace'], batch['mask'])

  out_c = np.asarray(out[..., 0]) + 1j * np.asarray(out[..., 1])
  out_k = np.fft.fft2(out_c, axes=(-2, -1), norm='ortho')
  k0 = np.asarray(batch['kspace'][..., 0]) + \
      1j * np.asarray(batch['kspace'][..., 1])
  m = np.asarray(batch['mask'][..., 0]) > 0
  np.testing.assert_allclose(out_k[m], k0[m], atol=1e-4)


def test_recnet_intermediate_recs():
  model = RecNet(num_blocks=2, num_convs=2, num_filters=4,
                 return_intermediate_recs=True)
  batch = _batch(jax.random.PRNGKey(0))
  variables = model.init(jax.random.PRNGKey(1), batch['inp'],
                         batch['kspace'], batch['mask'])
  out = model.apply(variables, batch['inp'], batch['kspace'], batch['mask'])
  assert isinstance(out, dict)
  assert out['pred'].shape == (2, 16, 16, 2)
  assert len(out['reconstructions']) == 2


def test_recnet_skip_final_dc():
  model = RecNet(num_blocks=2, num_convs=2, num_filters=4,
                 skip_final_dc=True)
  batch = _batch(jax.random.PRNGKey(0))
  variables = model.init(jax.random.PRNGKey(1), batch['inp'],
                         batch['kspace'], batch['mask'])
  out = model.apply(variables, batch['inp'], batch['kspace'], batch['mask'])
  # Without the final DC, sampled k-space lines are NOT exactly preserved
  out_c = np.asarray(out[..., 0]) + 1j * np.asarray(out[..., 1])
  out_k = np.fft.fft2(out_c, axes=(-2, -1), norm='ortho')
  k0 = np.asarray(batch['kspace'][..., 0]) + \
      1j * np.asarray(batch['kspace'][..., 1])
  m = np.asarray(batch['mask'][..., 0]) > 0
  assert not np.allclose(out_k[m], k0[m], atol=1e-4)


def test_recnet_construct_from_config():
  conf = Configuration.from_dict({
      'name': 'RecNet', 'num_blocks': 3, 'num_convs': 3, 'num_filters': 32})
  model = construct_model(conf, 'RecNet')
  assert model.num_blocks == 3
  assert model.INPUT_KEYS == ('inp', 'kspace', 'mask')


def test_recnet_skinny_dc_matches_dense():
  """dc_lines_acc (the exact skinny DC lowering) changes no numerics:
  forward and parameter gradients match the dense path, in both the
  unrolled and scan cascades, with and without the x0-from-input reuse."""
  batch = _batch(jax.random.PRNGKey(0))  # varden acc=2 line masks
  args = (batch['inp'], batch['kspace'], batch['mask'])
  for use_scan in (False, True):
    plain = RecNet(num_blocks=2, num_convs=2, num_filters=4,
                   use_scan=use_scan)
    skinny = RecNet(num_blocks=2, num_convs=2, num_filters=4,
                    use_scan=use_scan, dc_lines_acc=2)
    skinny_x0 = RecNet(num_blocks=2, num_convs=2, num_filters=4,
                       use_scan=use_scan, dc_lines_acc=2,
                       dc_zero_filled_input=False)
    v = plain.init(jax.random.PRNGKey(1), *args)
    out = plain.apply(v, *args)
    np.testing.assert_allclose(np.asarray(skinny.apply(v, *args)),
                               np.asarray(out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(skinny_x0.apply(v, *args)),
                               np.asarray(out), atol=1e-5)

    def loss(model):
      return lambda p: jnp.sum(
          (model.apply(p, *args) - batch['target']) ** 2)
    g_plain = jax.tree_util.tree_leaves(jax.grad(loss(plain))(v))
    g_skinny = jax.tree_util.tree_leaves(jax.grad(loss(skinny))(v))
    for a, b in zip(g_plain, g_skinny):
      np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_recnet_construct_threads_undersampling_to_skinny_dc():
  """construct_model derives dc_lines_acc from a threaded `undersampling`
  section (fixed-count Cartesian masks only)."""
  base = {'name': 'RecNet', 'num_blocks': 2, 'num_convs': 2,
          'num_filters': 4}
  conf = Configuration.from_dict(dict(
      base, undersampling={'sampling_scheme': 'varden',
                           'acceleration_factor': 8,
                           'variable_acceleration': False}))
  assert construct_model(conf, 'RecNet').dc_lines_acc == 8.0
  # radial / variable-acceleration masks must NOT enable the skinny path
  conf = Configuration.from_dict(dict(
      base, undersampling={'sampling_scheme': 'radial',
                           'acceleration_factor': 8}))
  assert construct_model(conf, 'RecNet').dc_lines_acc is None
  conf = Configuration.from_dict(dict(
      base, undersampling={'sampling_scheme': 'varden',
                           'acceleration_factor': 8,
                           'variable_acceleration': True}))
  assert construct_model(conf, 'RecNet').dc_lines_acc is None
  # explicit model-level override wins
  conf = Configuration.from_dict(dict(base, dc_lines_acc=4))
  assert construct_model(conf, 'RecNet').dc_lines_acc == 4


def test_recnet_param_count_matches_reference_formula():
  """3 blocks × (2→32 conv + 32→32 conv + 32→2 conv), k=3, with biases.

  Per block: (3·3·2·32 + 32) + (3·3·32·32 + 32) + (3·3·32·2 + 2)
  (reference configs/1-recnet.json model, recnet.py:29-62).
  """
  model = RecNet(num_blocks=3, num_convs=3, num_filters=32)
  batch = _batch(jax.random.PRNGKey(0))
  variables = model.init(jax.random.PRNGKey(1), batch['inp'],
                         batch['kspace'], batch['mask'])
  n_params = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(variables['params']))
  per_block = (3 * 3 * 2 * 32 + 32) + (3 * 3 * 32 * 32 + 32) + \
      (3 * 3 * 32 * 2 + 2)
  assert n_params == 3 * per_block


def test_recnet_scan_matches_unrolled():
  """Scan cascade computes the same function as the unrolled cascade when
  given identical per-block parameters."""
  batch = _batch(jax.random.PRNGKey(0))
  unrolled = RecNet(num_blocks=3, num_convs=2, num_filters=4)
  scanned = RecNet(num_blocks=3, num_convs=2, num_filters=4, use_scan=True)

  v_unrolled = unrolled.init(jax.random.PRNGKey(7), batch['inp'],
                             batch['kspace'], batch['mask'])
  # Stack the unrolled per-block params along a leading axis for scan.
  blocks = [v_unrolled['params']['block_{}'.format(i)] for i in range(3)]
  stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
  v_scan = {'params': {'blocks': {'block': stacked}}}

  out_u = unrolled.apply(v_unrolled, batch['inp'], batch['kspace'],
                         batch['mask'])
  out_s = scanned.apply(v_scan, batch['inp'], batch['kspace'], batch['mask'])
  np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s), atol=1e-5)


def test_recnet_jit_and_grad():
  model = RecNet(num_blocks=2, num_convs=2, num_filters=4)
  batch = _batch(jax.random.PRNGKey(0))
  variables = model.init(jax.random.PRNGKey(1), batch['inp'],
                         batch['kspace'], batch['mask'])

  @jax.jit
  def loss_fn(params):
    out = model.apply({'params': params}, batch['inp'], batch['kspace'],
                      batch['mask'])
    return jnp.mean((out - batch['target']) ** 2)

  grads = jax.grad(loss_fn)(variables['params'])
  norms = [float(jnp.linalg.norm(g))
           for g in jax.tree_util.tree_leaves(grads)]
  assert all(np.isfinite(n) for n in norms)
  assert any(n > 0 for n in norms)
