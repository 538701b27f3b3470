"""Numerics-core golden tests.

Strategy per SURVEY.md §4: pure-function unit tests for every op, golden
values vs numpy (the reference treats numpy/scipy as ground truth, e.g. its
own inline FFT checks at myfft.py:166-270), and gradient checks on the DC op
(the JAX analogue of the reference's torch.autograd.gradcheck at
myfft.py:250-268).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from csmri_refinement_tpu.ops import fft as jfft
from csmri_refinement_tpu.ops import masks as mask_ops
from csmri_refinement_tpu.ops import dc as dc_ops
import csmri_refinement_tpu.ops.undersample as us_ops

jax.config.update('jax_enable_x64', False)


def _rand_complex(rng, shape):
  return (rng.randn(*shape) + 1j * rng.randn(*shape)).astype(np.complex64)


# -- FFT helpers --------------------------------------------------------------

def test_fft2_matches_numpy_ortho(rng):
  x = _rand_complex(rng, (2, 16, 16))
  got = np.asarray(jfft.fft2(jnp.asarray(x)))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=1e-4)

  got = np.asarray(jfft.ifft2(jnp.asarray(x)))
  want = np.fft.ifft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_fft2c_matches_reference_convention(rng):
  """fft2c = fftshift(fft2(ifftshift(x))) with ortho norm (mymath.py:18-29)."""
  x = _rand_complex(rng, (8, 8))
  got = np.asarray(jfft.fft2c(jnp.asarray(x), axes=(0, 1)))
  want = np.fft.fftshift(
      np.fft.fft2(np.fft.ifftshift(x, axes=(0, 1)), axes=(0, 1),
                  norm='ortho'), axes=(0, 1))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_pack_unpack_roundtrip(rng):
  x = _rand_complex(rng, (2, 8, 8))
  packed = jfft.pack_complex(jnp.asarray(x))
  assert packed.shape == (2, 8, 8, 2)
  back = np.asarray(jfft.unpack_complex(packed))
  np.testing.assert_allclose(back, x, atol=1e-6)


def test_complex_abs(rng):
  x = rng.randn(2, 4, 4, 2).astype(np.float32)
  got = np.asarray(jfft.complex_abs(jnp.asarray(x)))
  want = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)[..., None]
  np.testing.assert_allclose(got, want, rtol=1e-5)


# -- Mask generators ----------------------------------------------------------

def test_cartesian_mask_np_acceleration():
  mask = mask_ops.cartesian_mask_np((4, 64, 64), acc=4, sample_n=8,
                                    centred=True,
                                    rng=np.random.RandomState(0))
  assert mask.shape == (4, 64, 64)
  # Lines are constant along the readout (last) axis
  assert np.all(mask == mask[:, :, :1])
  # Guaranteed central lines (centred layout)
  assert np.all(mask[:, 64 // 2 - 4:64 // 2 + 4, :] == 1)
  # n_lines = Nx // acc total sampled lines exactly
  lines_per_image = mask[:, :, 0].sum(axis=1)
  np.testing.assert_array_equal(lines_per_image, 64 // 4)


def test_cartesian_mask_np_uncentred_shift():
  rng_state = np.random.RandomState(3)
  mask_c = mask_ops.cartesian_mask_np((1, 32, 32), 4, 8, centred=True,
                                      rng=np.random.RandomState(3))
  mask_u = mask_ops.cartesian_mask_np((1, 32, 32), 4, 8, centred=False,
                                      rng=np.random.RandomState(3))
  np.testing.assert_array_equal(
      mask_u, np.fft.ifftshift(mask_c, axes=(-2, -1)))


def test_cartesian_mask_jax_matches_reference_statistics():
  """JAX Gumbel top-k mask has the same line count + center guarantee."""
  key = jax.random.PRNGKey(0)
  mask = np.asarray(mask_ops.cartesian_mask(key, (8, 64, 64), 4.0,
                                            sample_n=8, centred=True))
  assert mask.shape == (8, 64, 64)
  assert np.all(mask == mask[:, :, :1])
  assert np.all(mask[:, 64 // 2 - 4:64 // 2 + 4, :] == 1)
  lines_per_image = mask[:, :, 0].sum(axis=1)
  np.testing.assert_array_equal(lines_per_image, 64 // 4)


def test_cartesian_mask_jax_variable_acceleration():
  key = jax.random.PRNGKey(1)
  acc = jnp.array([2.0, 4.0, 8.0, 16.0])
  mask = np.asarray(mask_ops.cartesian_mask(key, (4, 64, 64), acc,
                                            sample_n=8, centred=True))
  lines = mask[:, :, 0].sum(axis=1)
  # For acc where Nx//acc < sample_n, the guaranteed central lines floor the
  # count (the reference would crash there: negative np.random.choice size).
  np.testing.assert_array_equal(
      lines, [64 // 2, 64 // 4, 64 // 8, max(64 // 16, 8)])


def test_cartesian_mask_line_count_matches_skinny_gate_fractional_acc():
  """ADVICE r3 (medium): for non-integer accelerations (e.g. 3.2, 6.4) the
  on-device generator's line count must equal skinny_num_lines exactly —
  an f32 floor-divide gives 256//3.2 == 80 while the reference f64
  arithmetic gives 79, silently dropping one restored k-space row."""
  from csmri_refinement_tpu.ops import dc as dc_ops
  # np.float32 covers the numpy-generic case: it is neither a Python
  # float nor an ndarray, and must still take the static host-count path.
  for h, acc in [(256, 3.2), (256, 6.4), (128, 2.56), (64, 4.0), (64, 3.2),
                 (256, np.float32(3.2)), (64, np.float32(3.2))]:
    mask = np.asarray(mask_ops.cartesian_mask(
        jax.random.PRNGKey(5), (4, h, h), acc, sample_n=8, centred=True))
    lines = mask[:, :, 0].sum(axis=1)
    expected = dc_ops.skinny_num_lines(h, acc, sample_n=8)
    np.testing.assert_array_equal(lines, expected), (h, acc)
    assert expected == max(int(h // float(acc)), 8)  # reference f64 math


def test_cartesian_mask_jax_is_deterministic_per_key():
  key = jax.random.PRNGKey(42)
  m1 = np.asarray(mask_ops.cartesian_mask(key, (2, 32, 32), 4.0))
  m2 = np.asarray(mask_ops.cartesian_mask(key, (2, 32, 32), 4.0))
  np.testing.assert_array_equal(m1, m2)


def test_cartesian_mask_jax_jittable():
  fn = jax.jit(lambda k: mask_ops.cartesian_mask(k, (2, 32, 32), 8.0))
  mask = np.asarray(fn(jax.random.PRNGKey(0)))
  assert mask.shape == (2, 32, 32)
  assert set(np.unique(mask)) <= {0.0, 1.0}


def test_radial_sampling_np():
  mask = mask_ops.radial_sampling_np((1, 32, 32), n_lines=8, rand=True,
                                     golden_angle=True, centred=True,
                                     rng=np.random.RandomState(0))
  assert mask.shape == (1, 32, 32)
  # DC point sampled; sampling rate roughly n_lines*nx/(nx*ny) with overlap
  assert mask[0, 16, 16] == 1
  rate = mask.mean()
  assert 0.05 < rate < 0.5


# -- Undersampling forward model ----------------------------------------------

def test_undersample_matches_numpy(rng):
  x = _rand_complex(rng, (2, 32, 32))
  mask = mask_ops.cartesian_mask_np((2, 32, 32), 4, 8, centred=False,
                                    rng=np.random.RandomState(1))
  x_und, k_und = us_ops.undersample(jnp.asarray(x), jnp.asarray(mask))
  k_want = mask * np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  x_want = np.fft.ifft2(k_want, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(np.asarray(k_und), k_want, atol=1e-4)
  np.testing.assert_allclose(np.asarray(x_und), x_want, atol=1e-4)


def test_undersample_batch_contract():
  key = jax.random.PRNGKey(0)
  gt = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))
  batch = us_ops.undersample_batch(key, gt, 'varden', 8)
  assert batch['inp'].shape == (3, 32, 32, 2)
  assert batch['kspace'].shape == (3, 32, 32, 2)
  assert batch['mask'].shape == (3, 32, 32, 1)
  assert batch['target'].shape == (3, 32, 32, 2)
  # target imag channel is zero (real GT images)
  np.testing.assert_allclose(np.asarray(batch['target'][..., 1]), 0.0)
  # kspace = mask * fft2(gt)
  k_full = np.fft.fft2(np.asarray(gt), axes=(-2, -1), norm='ortho')
  k_got = np.asarray(jfft.unpack_complex(batch['kspace']))
  m = np.asarray(batch['mask'][..., 0])
  np.testing.assert_allclose(k_got, m * k_full, atol=1e-4)


def test_undersample_batch_fixed_mask():
  gt = jnp.ones((1, 16, 16))
  fixed = np.zeros((1, 16, 16), np.float32)
  fixed[:, 0, :] = 1  # DC line only (uncentred)
  batch = us_ops.undersample_batch(jax.random.PRNGKey(0), gt,
                                   fixed_mask=fixed)
  np.testing.assert_array_equal(np.asarray(batch['mask'][..., 0]), fixed)


def test_center_crop_in_kspace(rng):
  img = rng.rand(32, 32).astype(np.float32)
  out = np.asarray(us_ops.center_crop_in_kspace(jnp.asarray(img), 16))
  assert out.shape == (16, 16)
  # Cropping with the full size is identity (up to abs)
  out_full = np.asarray(us_ops.center_crop_in_kspace(jnp.asarray(img), 32))
  np.testing.assert_allclose(out_full, np.abs(img), atol=1e-4)


# -- Data consistency ---------------------------------------------------------

def test_dc_preserves_sampled_lines(rng):
  """On sampled locations, output k-space equals k0 exactly
  (myfft.py:141: out = (1-mask)*k + k0)."""
  x = rng.randn(2, 16, 16, 2).astype(np.float32)
  gt = _rand_complex(rng, (2, 16, 16))
  mask = mask_ops.cartesian_mask_np((2, 16, 16), 2, 4, centred=False,
                                    rng=np.random.RandomState(0))
  k0c = mask * np.fft.fft2(gt, axes=(-2, -1), norm='ortho')
  k0 = np.stack([k0c.real, k0c.imag], -1).astype(np.float32)

  out = dc_ops.data_consistency(jnp.asarray(x), jnp.asarray(k0),
                                jnp.asarray(mask[..., None],
                                            dtype=jnp.float32))
  out_k = np.fft.fft2(np.asarray(out[..., 0]) + 1j * np.asarray(out[..., 1]),
                      axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(out_k[mask > 0], k0c[mask > 0], atol=1e-4)
  # On unsampled locations, k-space of x passes through
  k_x = np.fft.fft2(x[..., 0] + 1j * x[..., 1], axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(out_k[mask == 0], k_x[mask == 0], atol=1e-4)


def test_dc_matches_numpy_reference(rng):
  x = rng.randn(1, 8, 8, 2).astype(np.float32)
  k0 = rng.randn(1, 8, 8, 2).astype(np.float32)
  mask = (rng.rand(1, 8, 8) > 0.5).astype(np.float32)

  got = np.asarray(dc_ops.data_consistency(
      jnp.asarray(x), jnp.asarray(k0), jnp.asarray(mask[..., None])))
  want_c = dc_ops.data_consistency_np(
      x[..., 0] + 1j * x[..., 1], k0[..., 0] + 1j * k0[..., 1], mask)
  np.testing.assert_allclose(got[..., 0], want_c.real, atol=1e-4)
  np.testing.assert_allclose(got[..., 1], want_c.imag, atol=1e-4)


def test_dc_noise_level(rng):
  """Noisy merge: (1-m)*k + m*(k + v*k0)/(1+v) (myfft.py:137-139)."""
  k = _rand_complex(rng, (4, 4))
  k0 = _rand_complex(rng, (4, 4))
  m = (rng.rand(4, 4) > 0.5).astype(np.float32)
  v = 0.1
  got = np.asarray(dc_ops.kspace_merge_reference(
      jnp.asarray(k), jnp.asarray(k0), jnp.asarray(m), v))
  want = (1 - m) * k + m * (k + v * k0) / (1 + v)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_dc_gradients():
  """JAX-autodiff analogue of the reference's gradcheck (myfft.py:250-268)."""
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
  k0 = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
  mask = jnp.asarray((rng.rand(1, 8, 8, 1) > 0.5).astype(np.float32))

  def loss(x_):
    return jnp.sum(dc_ops.data_consistency(x_, k0, mask) ** 2)

  check_grads(loss, (x,), order=1, modes=['rev'], atol=1e-2, rtol=1e-2)


def test_dc_gradient_masks_sampled_lines():
  """d(dc)/dx is exactly the (1-mask) filter in k-space: gradients of the
  output w.r.t. x vanish where the mask replaced content."""
  x = jnp.zeros((1, 8, 8, 2))
  k0 = jnp.zeros((1, 8, 8, 2))
  mask = jnp.ones((1, 8, 8, 1))  # everything sampled → output indep. of x

  grad = jax.grad(
      lambda x_: jnp.sum(dc_ops.data_consistency(x_, k0, mask)))(x)
  np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-6)


def _line_mask_batch(key, b=3, h=64, w=48, acc=8):
  """Realistic flagship batch: varden line masks + undersampled k-space."""
  gt = jax.random.uniform(jax.random.PRNGKey(11), (b, h, w))
  return us_ops.undersample_batch(key, gt, 'varden', acc)


def test_skinny_dc_matches_dense(rng):
  """The sampled-lines DC lowering is exact for Cartesian line masks:
  matches the dense DC and the numpy reference to fp noise."""
  batch = _line_mask_batch(jax.random.PRNGKey(3))
  k0, mask = batch['kspace'], batch['mask']
  k = dc_ops.skinny_num_lines(64, 8)
  # masks carry exactly K lines (Gumbel top-k + guaranteed centre lines)
  counts = np.asarray(jnp.max(mask[..., 0], -1).sum(-1))
  np.testing.assert_array_equal(counts, k)

  x = jnp.asarray(rng.randn(3, 64, 48, 2).astype(np.float32))
  ctx = dc_ops.skinny_dc_context(k0, mask, k)
  got = np.asarray(dc_ops.data_consistency(x, k0, mask, skinny_ctx=ctx))
  dense = np.asarray(dc_ops.data_consistency(x, k0, mask))
  np.testing.assert_allclose(got, dense, atol=1e-5)

  want = dc_ops.data_consistency_np(
      np.asarray(x[..., 0] + 1j * x[..., 1]),
      np.asarray(k0[..., 0] + 1j * k0[..., 1]), np.asarray(mask[..., 0]))
  np.testing.assert_allclose(got[..., 0], want.real, atol=1e-4)
  np.testing.assert_allclose(got[..., 1], want.imag, atol=1e-4)


def test_skinny_dc_x0_override_and_projection(rng):
  """x0 override (the pipeline's inp == ifft2(kspace) invariant) matches
  the self-computed x0, and DC is a projection: DC(x0) == x0."""
  batch = _line_mask_batch(jax.random.PRNGKey(4))
  k0, mask, inp = batch['kspace'], batch['mask'], batch['inp']
  k = dc_ops.skinny_num_lines(64, 8)

  ctx_self = dc_ops.skinny_dc_context(k0, mask, k)
  ctx_inp = dc_ops.skinny_dc_context(k0, mask, k, x0=inp)
  np.testing.assert_allclose(np.asarray(ctx_self[1]), np.asarray(inp),
                             atol=1e-5)

  x = jnp.asarray(rng.randn(3, 64, 48, 2).astype(np.float32))
  np.testing.assert_allclose(
      np.asarray(dc_ops._dc_skinny(x, ctx_self)),
      np.asarray(dc_ops._dc_skinny(x, ctx_inp)), atol=1e-5)
  # projection invariant
  np.testing.assert_allclose(np.asarray(dc_ops._dc_skinny(ctx_self[1],
                                                          ctx_self)),
                             np.asarray(ctx_self[1]), atol=1e-5)


def test_skinny_dc_gradients_match_dense(rng):
  """VJPs of the skinny lowering equal the dense DC's custom VJP (the
  x-Jacobian I - A_S is Hermitian; autodiff of the skinny einsums keeps
  the same structure)."""
  batch = _line_mask_batch(jax.random.PRNGKey(5))
  k0, mask = batch['kspace'], batch['mask']
  k = dc_ops.skinny_num_lines(64, 8)
  ctx = dc_ops.skinny_dc_context(k0, mask, k)
  x = jnp.asarray(rng.randn(3, 64, 48, 2).astype(np.float32))
  ct = jnp.asarray(rng.randn(3, 64, 48, 2).astype(np.float32))

  g_dense = jax.vjp(lambda v: dc_ops.data_consistency(v, k0, mask), x)[1](
      ct)[0]
  g_skinny = jax.vjp(lambda v: dc_ops._dc_skinny(v, ctx), x)[1](ct)[0]
  np.testing.assert_allclose(np.asarray(g_skinny), np.asarray(g_dense),
                             atol=1e-5)

  def loss(x_):
    return jnp.sum(dc_ops._dc_skinny(x_, ctx) ** 2)
  check_grads(loss, (x,), order=1, modes=['rev'], atol=1e-2, rtol=1e-2)


def test_skinny_num_lines_matches_generator():
  """skinny_num_lines reproduces cartesian_mask's exact line count,
  including the centre-lines floor at small sizes."""
  for h, acc in ((512, 8), (256, 8), (64, 8), (32, 8), (16, 8), (64, 4)):
    mask = mask_ops.cartesian_mask(jax.random.PRNGKey(0), (4, h, h),
                                   float(acc))
    counts = np.asarray(jnp.max(mask, -1).sum(-1))
    np.testing.assert_array_equal(counts, dc_ops.skinny_num_lines(h, acc))


def test_lines_acc_from_undersampling():
  assert dc_ops.lines_acc_from_undersampling(None) is None
  assert dc_ops.lines_acc_from_undersampling(
      {'sampling_scheme': 'radial', 'acceleration_factor': 8}) is None
  assert dc_ops.lines_acc_from_undersampling(
      {'sampling_scheme': 'varden', 'variable_acceleration': True}) is None
  assert dc_ops.lines_acc_from_undersampling(
      {'sampling_scheme': 'varden', 'acceleration_factor': 8}) == 8.0
  assert dc_ops.lines_acc_from_undersampling(
      {'acceleration_factor': 4}) == 4.0  # varden is the default scheme


def test_var_dens_mask_2d():
  mask = mask_ops.var_dens_mask_2d((2, 32, 32), ivar=0.01,
                                   rng=np.random.RandomState(0))
  assert mask.shape == (2, 32, 32)
  # Central block fully sampled
  assert np.all(mask[:, 12:21, 12:21] == 1)


def test_nlines_mask():
  mask = mask_ops.nlines_mask((2, 32, 32), n=8, centred=True,
                              sample_centre=True, sample_n=2,
                              rng=np.random.RandomState(0))
  lines = mask[:, :, 0].sum(axis=1)
  np.testing.assert_array_equal(lines, 8)


def test_lowres_mask():
  mask = mask_ops.lowres_mask((1, 32, 32), n=8, centred=True, skip=False,
                              rng=np.random.RandomState(0))
  assert mask[0, :, 0].sum() == 8
  assert np.all(mask[0, 12:20, :] == 1)


def test_shear_grid_mask():
  mask = mask_ops.shear_grid_mask((4, 32, 32), acceleration_rate=4,
                                  sample_low_freq=False, centred=True,
                                  rng=np.random.RandomState(0))
  # every frame samples nx/4 lines, shifted per frame
  lines = mask[:, :, 0].sum(axis=1)
  np.testing.assert_array_equal(lines, 8)
  assert not np.array_equal(mask[0], mask[1])


def test_perturbed_shear_grid_mask():
  mask = mask_ops.shear_grid_mask((2, 32, 32), acceleration_rate=4,
                                  sample_low_freq=True, centred=True,
                                  sample_n=4, perturb=True,
                                  rng=np.random.RandomState(0))
  assert mask.shape == (2, 32, 32)
  assert np.all(mask[:, 14:17, :] == 1)


def test_tensor_transforms():
  from csmri_refinement_tpu.utils import tensor_transforms as tt
  rng_ = np.random.RandomState(0)
  x = jnp.asarray(rng_.randn(2, 4, 4, 2).astype(np.float32))

  scaled = np.asarray(tt.scale_batch_per_example(x))
  assert scaled.min() >= 0 and scaled.max() <= 1

  norm = np.asarray(tt.normalize_batch_per_example(x))
  np.testing.assert_allclose(norm.reshape(2, -1, 2).mean(axis=1), 0,
                             atol=1e-5)
  np.testing.assert_allclose(norm.reshape(2, -1, 2).std(axis=1), 1,
                             atol=1e-4)

  mag = np.asarray(tt.complex_abs(x))
  want = np.sqrt(np.asarray(x)[..., 0] ** 2 + np.asarray(x)[..., 1] ** 2)
  np.testing.assert_allclose(mag[..., 0], want, rtol=1e-5)

  onehot = np.asarray(tt.convert_to_one_hot(jnp.asarray([[0, 1], [2, 1]])))
  assert onehot.shape == (2, 2, 3)
  np.testing.assert_array_equal(onehot.argmax(-1), [[0, 1], [2, 1]])

  nr = np.asarray(tt.normalize_range(jnp.asarray([-1.0, 0.0, 1.0]),
                                     (-1.0, 1.0), clamp=False))
  np.testing.assert_allclose(nr, [0.0, 0.5, 1.0])


def test_undersampling_rate_and_sensitivity_search():
  mask = np.zeros((4, 4))
  mask[0] = 1
  assert mask_ops.undersampling_rate(mask) == 0.25

  ivar = mask_ops.get_undersampling_sensitivity(
      (32, 32), target_factor=4, num_trials=8,
      rng=np.random.RandomState(0))
  masks = mask_ops.var_dens_mask_2d((16, 32, 32), ivar,
                                    rng=np.random.RandomState(1))
  rate = masks.mean()
  assert abs(rate - 0.25) < 0.05
