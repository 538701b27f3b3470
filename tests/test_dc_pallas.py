"""Fused Pallas DC kernel vs the reference composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

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
