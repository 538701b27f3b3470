"""Fused Pallas DC kernel vs the reference composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.ops import dc as dc_ops
from csmri_refinement_tpu.ops.dc_pallas import dc_pallas
from csmri_refinement_tpu.ops import masks as mask_ops


def test_dc_pallas_matches_unfused(rng):
  x = rng.randn(2, 16, 16, 2).astype(np.float32)
  gt = (rng.randn(2, 16, 16) + 1j * rng.randn(2, 16, 16))
  mask = mask_ops.cartesian_mask_np((2, 16, 16), 2, 4, centred=False,
                                    rng=np.random.RandomState(0))
  k0c = mask * np.fft.fft2(gt, axes=(-2, -1), norm='ortho')
  k0 = np.stack([k0c.real, k0c.imag], -1).astype(np.float32)
  m = mask[..., None].astype(np.float32)

  want = np.asarray(dc_ops.data_consistency(
      jnp.asarray(x), jnp.asarray(k0), jnp.asarray(m)))
  got = np.asarray(dc_pallas(jnp.asarray(x), jnp.asarray(k0),
                             jnp.asarray(m), interpret=True))
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_dc_fused_custom_vjp_matches_autodiff(rng, monkeypatch):
  """The fused kernel's hand-derived VJP equals autodiff through the
  unfused composition."""
  monkeypatch.setattr(dc_ops, '_FUSED_MODE', '0')
  x = jnp.asarray(rng.randn(1, 16, 16, 2).astype(np.float32))
  k0 = jnp.asarray(rng.randn(1, 16, 16, 2).astype(np.float32))
  mask = jnp.asarray((rng.rand(1, 16, 16, 1) > 0.5).astype(np.float32))

  def loss_unfused(x_, k0_):
    return jnp.sum(dc_ops.data_consistency(x_, k0_, mask) ** 2)

  gx_ref, gk_ref = jax.grad(loss_unfused, argnums=(0, 1))(x, k0)

  def loss_fused(x_, k0_):
    return jnp.sum(dc_ops._dc_fused(x_, k0_, mask) ** 2)

  gx, gk = jax.grad(loss_fused, argnums=(0, 1))(x, k0)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=2e-3)
  np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=2e-3)


def test_dc_pallas_preserves_sampled_lines(rng):
  x = rng.randn(1, 16, 16, 2).astype(np.float32)
  gt = rng.rand(1, 16, 16)
  mask = mask_ops.cartesian_mask_np((1, 16, 16), 2, 4, centred=False,
                                    rng=np.random.RandomState(1))
  k0c = mask * np.fft.fft2(gt, axes=(-2, -1), norm='ortho')
  k0 = np.stack([k0c.real, k0c.imag], -1).astype(np.float32)
  m = mask[..., None].astype(np.float32)

  out = np.asarray(dc_pallas(jnp.asarray(x), jnp.asarray(k0),
                             jnp.asarray(m), interpret=True))
  out_k = np.fft.fft2(out[..., 0] + 1j * out[..., 1], axes=(-2, -1),
                      norm='ortho')
  np.testing.assert_allclose(out_k[mask > 0], k0c[mask > 0], atol=2e-4)


@pytest.mark.parametrize('block', [False, True],
                         ids=['split-real', 'block-gemm'])
def test_dc_einsum_matches_reference_and_grads(rng, monkeypatch, block):
  """The batched-GEMM DC (TPU default split-real path, plus the off-by-
  default dense block lowering) matches the numpy golden and its custom
  VJP matches autodiff of the plain path."""
  import jax
  import jax.numpy as jnp
  from csmri_refinement_tpu.ops import dc

  monkeypatch.setattr(dc, '_DC_BLOCK', block)

  x = rng.randn(3, 16, 16, 2).astype(np.float32)
  k0 = rng.randn(3, 16, 16, 2).astype(np.float32)
  mask = (rng.rand(3, 16, 16, 1) < 0.4).astype(np.float32)

  got = np.asarray(jax.jit(dc._dc_einsum)(x, k0, mask))
  xc = x[..., 0] + 1j * x[..., 1]
  k0c = k0[..., 0] + 1j * k0[..., 1]
  want = dc.data_consistency_np(xc, k0c, mask[..., 0])
  np.testing.assert_allclose(got[..., 0], np.real(want), atol=2e-4)
  np.testing.assert_allclose(got[..., 1], np.imag(want), atol=2e-4)

  def loss_einsum(x, k0):
    return jnp.sum(dc._dc_einsum(x, k0, mask) ** 2)

  def loss_plain(x, k0):
    xc = dc.fft.unpack_complex(x)
    k = dc.fft.fft2(xc)
    out = dc.kspace_merge_reference(k, dc.fft.unpack_complex(k0),
                                    mask[..., 0])
    return jnp.sum(dc.fft.pack_complex(dc.fft.ifft2(out)) ** 2)

  g1 = jax.grad(loss_einsum, argnums=(0, 1))(x, k0)
  g2 = jax.grad(loss_plain, argnums=(0, 1))(x, k0)
  for a, b in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_dc_einsum_radix_split_matches_reference(rng, monkeypatch):
  """Radix-split GEMM DC (the 512² lowering) against the numpy golden,
  including gradients and a rectangular shape."""
  from csmri_refinement_tpu.ops import fft as jfft

  monkeypatch.setattr(jfft, '_RADIX_BASE', 8)
  x = rng.randn(2, 32, 16, 2).astype(np.float32)
  k0 = rng.randn(2, 32, 16, 2).astype(np.float32)
  mask = (rng.rand(2, 32, 16, 1) < 0.4).astype(np.float32)

  got = np.asarray(jax.jit(dc_ops._dc_einsum)(x, k0, mask))
  xc = x[..., 0] + 1j * x[..., 1]
  k0c = k0[..., 0] + 1j * k0[..., 1]
  want = dc_ops.data_consistency_np(xc, k0c, mask[..., 0])
  np.testing.assert_allclose(got[..., 0], np.real(want), atol=2e-4)
  np.testing.assert_allclose(got[..., 1], np.imag(want), atol=2e-4)

  def loss_einsum(x_, k0_):
    return jnp.sum(dc_ops._dc_einsum(x_, k0_, mask) ** 2)

  def loss_plain(x_, k0_):
    xc_ = dc_ops.fft.unpack_complex(x_)
    k = dc_ops.fft.fft2(xc_)
    out = dc_ops.kspace_merge_reference(k, dc_ops.fft.unpack_complex(k0_),
                                        mask[..., 0])
    return jnp.sum(dc_ops.fft.pack_complex(dc_ops.fft.ifft2(out)) ** 2)

  g1 = jax.grad(loss_einsum, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(k0))
  g2 = jax.grad(loss_plain, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(k0))
  for a, b in zip(g1, g2):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
