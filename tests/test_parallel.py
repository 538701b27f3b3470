"""Multi-device correctness tests on the 8-device virtual CPU mesh.

The north-star claim of the TPU rebuild is that the data-parallel mesh path
(`parallel/mesh.py` + the `mesh` config key wired through both runners) is
numerically equivalent to the single-device path: params replicated, batch
sharded over the `data` axis, GSPMD inserting the gradient all-reduce. The
reference's analogue was single-node nn.DataParallel
(/root/reference/utils/custom_data_parallel.py:26), which it never tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.parallel import make_mesh, replicate, shard_batch
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.utils.config import Configuration

N_DEV = 8


def _leaves_allclose(a, b, atol, rtol=1e-5):
  la = jax.tree_util.tree_leaves(a)
  lb = jax.tree_util.tree_leaves(b)
  assert len(la) == len(lb)
  for x, y in zip(la, lb):
    np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                               atol=atol, rtol=rtol)


def _std_conf(mesh=None, **overrides):
  base = {
      'seed': 3,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 16, 'num_val': 8},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'standard',
      'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 2, 'num_convs': 2,
                'num_filters': 8},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'batch_size': 8,
      'validation_metrics': ['psnr'],
  }
  if mesh is not None:
    base['mesh'] = mesh
  base.update(overrides)
  return Configuration.from_dict(base)


def _adv_conf(mesh=None):
  base = {
      'seed': 4,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 8, 'num_val': 8},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'adversarial',
      'vgg_random_init': True,
      'application': 'reconstruction',
      'generator_model': {
          'name': 'RefinementWrapper',
          'mode': 'real-penalty-add',
          'input_mode': 'output',
          'pretrained_model': {'name': 'RecNet', 'num_blocks': 1,
                               'num_convs': 2, 'num_filters': 4},
          'learnable_model': {
              'name': 'UNET', 'num_inputs': 2, 'num_outputs': 1,
              'num_layers_per_scale': 1, 'encode_filters': [4, 8],
              'decode_filters': [4], 'kernel_size': 4,
              'upsampling_mode': 'nn-resize-conv',
              'output_activation': 'none', 'padding': 'reflection',
              'decoder_act_upsampling_only': True},
      },
      'discriminator_model': {
          'num_inputs': 1,
          'input_method': 'simple-magnitude',
          'num_filters_per_layer': [8, 16],
          'strides': [2, 2],
          'kernel_sizes': 4,
          'final_conv_kernel_size': 4,
          'padding': 'reflection',
          'use_norm_layers': 'not-first',
          'norm_layer': 'batch',  # exercises cross-device batch-stat sync
          'compute_features': True,
          'use_image_pool': True,
          'image_pool_size': 16,
      },
      'generator_adversarial_losses': ['gan', 'FeatureMatching'],
      'generator_losses': ['VGG19', 'FeaturePenalty'],
      'generator_loss_weights': {'gan': 0.5, 'VGG19': 10,
                                 'FeaturePenalty': 2},
      'discriminator_losses': ['gan'],
      'discriminator_label_smoothing': 0.1,
      'feature_penalty': {'criterion': 'L1',
                          'input_key': 'prescaled_refinement'},
      'generator_optimizer': {'name': 'Adam', 'learning_rate': 0.0002,
                              'beta1': 0.5},
      'discriminator_optimizer': {'name': 'Adam', 'learning_rate': 0.0002,
                                  'beta1': 0.5},
      'batch_size': 8,
      'validation_metrics': ['psnr'],
  }
  if mesh is not None:
    base['mesh'] = mesh
  return Configuration.from_dict(base)


def test_make_mesh_and_conf():
  assert jax.device_count() >= N_DEV
  mesh = make_mesh(N_DEV)
  assert mesh.size == N_DEV and mesh.axis_names == ('data',)
  from csmri_refinement_tpu.parallel import mesh_from_conf
  assert mesh_from_conf(_std_conf()) is None
  m = mesh_from_conf(_std_conf(mesh={'data': N_DEV}))
  assert m is not None and m.size == N_DEV


def test_make_mesh_spatial_and_conf():
  """2-D (data x spatial) mesh: shape, axis names, and config wiring."""
  from csmri_refinement_tpu.parallel import mesh_from_conf
  mesh = make_mesh(N_DEV, spatial=2)
  assert mesh.axis_names == ('data', 'spatial')
  assert mesh.shape['data'] == N_DEV // 2 and mesh.shape['spatial'] == 2
  m = mesh_from_conf(_std_conf(mesh={'data': N_DEV // 2, 'spatial': 2}))
  assert m is not None and m.size == N_DEV
  assert m.shape['spatial'] == 2


def test_shard_batch_spatial_spec():
  """On a 2-D mesh, image-like leaves shard (batch, H); flat leaves shard
  batch only; params stay replicated."""
  mesh = make_mesh(N_DEV, spatial=2)
  batch = {'inp': np.zeros((8, 16, 16, 2), np.float32),
           'label3d': np.zeros((8, 16, 16), np.float32),
           'scalar_per_ex': np.zeros((8,), np.float32)}
  sharded = shard_batch(batch, mesh)
  assert sharded['inp'].sharding.is_equivalent_to(
      jax.sharding.NamedSharding(mesh, P('data', 'spatial')), 4)
  assert sharded['label3d'].sharding.is_equivalent_to(
      jax.sharding.NamedSharding(mesh, P('data', 'spatial')), 3)
  assert sharded['scalar_per_ex'].sharding.is_equivalent_to(
      jax.sharding.NamedSharding(mesh, P('data')), 1)
  rep = replicate({'w': np.ones((4, 4), np.float32)}, mesh)
  assert rep['w'].sharding.is_equivalent_to(
      jax.sharding.NamedSharding(mesh, P()), 2)


def test_shard_and_replicate_shardings():
  mesh = make_mesh(N_DEV)
  batch = {'inp': np.zeros((8, 16, 16, 2), np.float32),
           'mask': np.ones((8, 16, 16, 1), np.float32)}
  sharded = shard_batch(batch, mesh)
  for leaf in jax.tree_util.tree_leaves(sharded):
    assert leaf.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, P('data')), leaf.ndim)
    assert len(leaf.sharding.device_set) == N_DEV
  params = {'w': np.ones((4, 4), np.float32)}
  rep = replicate(params, mesh)
  assert rep['w'].sharding.is_equivalent_to(
      jax.sharding.NamedSharding(mesh, P()), 2)


def _run_standard(mesh_conf, epochs=2, **overrides):
  conf = _std_conf(mesh=mesh_conf, **overrides)
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=3)
  for epoch in range(1, epochs + 1):
    losses, _ = runner.train_epoch(loader, epoch)
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  _, val_losses, val_metrics = runner.validate(DataLoader(val_set, 8))
  return runner, losses, val_losses, val_metrics


def test_standard_mesh_matches_single_device():
  """Two epochs of data-parallel training over 8 devices must produce the
  same losses, parameters, and validation metrics as single-device."""
  r1, losses1, vloss1, vmet1 = _run_standard(None)
  r8, losses8, vloss8, vmet8 = _run_standard({'data': N_DEV})
  assert r8.mesh is not None and r8.mesh.size == N_DEV
  assert abs(losses1['loss'].value - losses8['loss'].value) < 1e-5
  assert abs(vloss1['loss_MSE'].value - vloss8['loss_MSE'].value) < 1e-5
  assert abs(vmet1['psnr'].value - vmet8['psnr'].value) < 1e-3
  # 2e-5 (not 1e-5) on params: two epochs of Adam amplify the reduction-
  # order float noise between GSPMD all-reduce and single-device batch
  # sums on near-zero bias leaves; the adversarial siblings use the same.
  _leaves_allclose(r1.state['params'], r8.state['params'], atol=2e-5)


def test_standard_spatial_mesh_matches_single_device():
  """Training with image rows sharded 2-way on top of 4-way data
  parallelism (2-D GSPMD mesh incl. halo exchanges for the SAME-padded
  convs and DC k-space collectives) must match single-device.

  Pin BOTH runs to the GEMM DC lowering (what a spatial mesh forces):
  this isolates the GSPMD-equivalence claim from the lowering choice —
  the native-FFT vs GEMM numeric delta is golden-tested elsewhere and
  would otherwise be amplified past 1e-5 by Adam's per-step
  normalization."""
  from csmri_refinement_tpu.ops import dc
  dc.set_spatial_mesh(True)
  r1, losses1, vloss1, vmet1 = _run_standard(None, epochs=1)
  r8, losses8, vloss8, vmet8 = _run_standard(
      {'data': N_DEV // 2, 'spatial': 2}, epochs=1)
  assert r8.mesh is not None and r8.mesh.size == N_DEV
  assert r8.mesh.shape['spatial'] == 2
  assert abs(losses1['loss'].value - losses8['loss'].value) < 1e-5
  assert abs(vmet1['psnr'].value - vmet8['psnr'].value) < 1e-3
  # 5e-5: Adam steps on near-zero bias leaves amplify GSPMD-vs-local
  # reduction-order rounding (the leaves themselves are ~1e-5); the loss
  # and PSNR asserts above are the semantic-equivalence claim.
  _leaves_allclose(r1.state['params'], r8.state['params'], atol=5e-5)


def test_standard_scan_spatial_mesh_matches_single_device():
  """steps_per_fetch scan × 2-D spatial mesh (f32): the composition that
  first crashed XLA:CPU's fft thunk (layout RET_CHECK from the on-device
  forward model's jnp.fft under GSPMD partitioning — round-5 fix: a
  spatial mesh forces the matmul-DFT in ops/fft.py, the same switch
  ops/dc.py already had). Regression: must run AND match the
  single-device scan run."""
  from csmri_refinement_tpu.ops import dc
  dc.set_spatial_mesh(True)
  r1, losses1, _, vmet1 = _run_standard(None, epochs=1, steps_per_fetch=2)
  r8, losses8, _, vmet8 = _run_standard(
      {'data': N_DEV // 2, 'spatial': 2}, epochs=1, steps_per_fetch=2)
  assert r8.mesh is not None and r8.mesh.shape['spatial'] == 2
  assert abs(losses1['loss'].value - losses8['loss'].value) < 1e-5
  assert abs(vmet1['psnr'].value - vmet8['psnr'].value) < 1e-3
  # 1e-4: the scan's two Adam updates per chunk double the amplification
  # of GSPMD-vs-local reduction-order rounding on near-zero bias leaves
  # (observed max 5.3e-5); loss/PSNR above are the semantic claim.
  _leaves_allclose(r1.state['params'], r8.state['params'], atol=1e-4)


def test_adversarial_mesh_matches_single_device():
  """One epoch of the full GAN step (pool, BN batch stats, D-then-G) over
  the mesh must match single-device: gen/disc params, batch stats, pool."""
  def run(mesh_conf):
    conf = _adv_conf(mesh=mesh_conf)
    runner = build_runner(conf, 'adversarial', 'train')
    train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
    loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=4)
    losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
    return runner, losses

  r1, losses1 = run(None)
  r8, losses8 = run({'data': N_DEV})
  assert r8.mesh is not None and r8.mesh.size == N_DEV
  assert abs(losses1['gen_loss'].value - losses8['gen_loss'].value) < 1e-4
  assert abs(losses1['disc_loss'].value - losses8['disc_loss'].value) < 1e-4
  _leaves_allclose(r1.gen_state['params'], r8.gen_state['params'],
                   atol=2e-5)
  _leaves_allclose(r1.disc_state['params'], r8.disc_state['params'],
                   atol=2e-5)
  _leaves_allclose(r1.disc_state['batch_stats'],
                   r8.disc_state['batch_stats'], atol=2e-5)
  if r1.pool_state is not None:
    _leaves_allclose(r1.pool_state, r8.pool_state, atol=2e-5)


def test_adversarial_spatial_mesh_matches_single_device():
  """The full GAN step with image rows sharded 2-way on top of data
  parallelism (pool, BN batch stats, D-then-G under a 2-D GSPMD mesh)
  must match single-device — the in-suite version of the driver dryrun's
  4x2 check."""
  from csmri_refinement_tpu.ops import dc
  dc.set_spatial_mesh(True)

  def run(mesh_conf):
    conf = _adv_conf(mesh=mesh_conf)
    runner = build_runner(conf, 'adversarial', 'train')
    train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
    loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=4)
    losses, _ = runner.train_epoch(loader, 1, steps_per_train_summary=100)
    return runner, losses

  r1, losses1 = run(None)
  r8, losses8 = run({'data': N_DEV // 2, 'spatial': 2})
  assert r8.mesh is not None and r8.mesh.size == N_DEV
  assert r8.mesh.shape['spatial'] == 2
  assert abs(losses1['gen_loss'].value - losses8['gen_loss'].value) < 1e-4
  assert abs(losses1['disc_loss'].value - losses8['disc_loss'].value) < 1e-4
  # Losses above are the semantic-equivalence claim. Params: the epoch is
  # exactly ONE Adam step (8 examples / batch 8), and a first Adam step is
  # +-lr*sign(grad) (m_hat/sqrt(v_hat) = g/|g|), so any near-zero disc
  # gradient whose sign flips under the spatial mesh's halo-exchange
  # reduction order moves the param by exactly 2*lr = 4e-4 (observed).
  # Bound: 2*lr + slack. The gen (behind the frozen RecNet + losses that
  # average over many pixels) shows no sign flips; keep it tight.
  _leaves_allclose(r1.gen_state['params'], r8.gen_state['params'],
                   atol=5e-5)
  _leaves_allclose(r1.disc_state['params'], r8.disc_state['params'],
                   atol=5e-4)
  _leaves_allclose(r1.disc_state['batch_stats'],
                   r8.disc_state['batch_stats'], atol=5e-5)
  if r1.pool_state is not None:
    _leaves_allclose(r1.pool_state, r8.pool_state, atol=5e-5)


def test_skinny_dc_sharded_matches_single_device(rng):
  """The skinny (sampled-lines) DC — gathers, top-k, packed einsums —
  partitions cleanly under batch AND batch+spatial sharding."""
  from jax.sharding import NamedSharding
  from csmri_refinement_tpu.ops import dc as dc_ops
  import csmri_refinement_tpu.ops.undersample as us_ops

  gt = jax.random.uniform(jax.random.PRNGKey(2), (N_DEV * 2, 32, 32))
  batch = jax.jit(lambda g: us_ops.undersample_batch(
      jax.random.PRNGKey(3), g, 'varden', 2))(gt)
  k0, mask = batch['kspace'], batch['mask']
  x = jnp.asarray(rng.randn(N_DEV * 2, 32, 32, 2).astype(np.float32))
  klines = dc_ops.skinny_num_lines(32, 2)

  def dc_fn(v, k, m):
    ctx = dc_ops.skinny_dc_context(k, m, klines)
    return dc_ops._dc_skinny(v, ctx)

  want = np.asarray(jax.jit(dc_fn)(x, k0, mask))
  for mesh in (make_mesh(N_DEV), make_mesh(N_DEV, spatial=2)):
    spec = P('data', 'spatial') if 'spatial' in mesh.axis_names \
        else P('data')
    put = lambda a: jax.device_put(a, NamedSharding(mesh, spec))
    got = np.asarray(jax.jit(dc_fn)(put(x), put(k0), put(mask)))
    np.testing.assert_allclose(got, want, atol=1e-5,
                               err_msg=str(mesh.axis_names))


def test_checkpoint_roundtrip_under_mesh(tmp_path):
  """Save under a mesh, restore into a fresh mesh runner AND into a
  single-device runner; predictions must agree everywhere."""
  from csmri_refinement_tpu.utils import checkpoints

  conf = _std_conf(mesh={'data': N_DEV})
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size, shuffle=True, seed=3)
  runner.train_epoch(loader, 1)

  path = str(tmp_path / 'mesh.ckpt')
  checkpoints.save_checkpoint(path, conf, runner, epoch=1,
                              best_val_metrics={})

  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  batch = runner.preparer.prepare_val(next(iter(DataLoader(val_set, 8))))
  out_orig = np.asarray(runner.predict(batch))

  r_mesh = build_runner(_std_conf(mesh={'data': N_DEV}), 'standard', 'train')
  checkpoints.restore_checkpoint(path, r_mesh)
  np.testing.assert_allclose(np.asarray(r_mesh.predict(batch)), out_orig,
                             atol=1e-6)

  r_single = build_runner(_std_conf(), 'standard', 'train')
  checkpoints.restore_checkpoint(path, r_single)
  np.testing.assert_allclose(np.asarray(r_single.predict(batch)), out_orig,
                             atol=1e-6)


def test_mesh_requires_divisible_batch():
  """Sharding a batch not divisible by the mesh size must fail loudly,
  not silently produce wrong math."""
  mesh = make_mesh(N_DEV)
  batch = {'inp': np.zeros((6, 8, 8, 2), np.float32)}
  with pytest.raises(Exception):
    sharded = shard_batch(batch, mesh)
    jax.block_until_ready(jax.tree_util.tree_leaves(sharded))


def test_dc_einsum_sharded_matches_single_device(rng):
  """The GEMM DC (incl. radix splits) partitions cleanly under a
  batch-sharded mesh: GSPMD output equals the unsharded computation."""
  from jax.sharding import NamedSharding
  from csmri_refinement_tpu.ops import dc as dc_ops
  from csmri_refinement_tpu.ops import fft as jfft

  x = rng.randn(N_DEV * 2, 32, 32, 2).astype(np.float32)
  k0 = rng.randn(N_DEV * 2, 32, 32, 2).astype(np.float32)
  mask = (rng.rand(N_DEV * 2, 32, 32, 1) < 0.4).astype(np.float32)

  want = np.asarray(jax.jit(dc_ops._dc_einsum)(x, k0, mask))

  mesh = make_mesh(N_DEV)
  shard = NamedSharding(mesh, P('data'))
  xs = jax.device_put(x, shard)
  k0s = jax.device_put(k0, shard)
  ms = jax.device_put(mask, shard)
  got = np.asarray(jax.jit(dc_ops._dc_einsum)(xs, k0s, ms))
  np.testing.assert_allclose(got, want, atol=1e-5)

  # Same with radix splits engaged (base 8 → two split levels at 32)
  orig = jfft._RADIX_BASE
  jfft._RADIX_BASE = 8
  try:
    want_r = np.asarray(jax.jit(dc_ops._dc_einsum)(x, k0, mask))
    got_r = np.asarray(jax.jit(dc_ops._dc_einsum)(xs, k0s, ms))
  finally:
    jfft._RADIX_BASE = orig
  np.testing.assert_allclose(want_r, want, atol=1e-4)
  np.testing.assert_allclose(got_r, want_r, atol=1e-5)
