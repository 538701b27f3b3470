"""Matmul-DFT backend equivalence vs numpy FFT (the TPU lowering)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from csmri_refinement_tpu.ops import fft as jfft


def test_dft2_matches_fft(rng):
  x = (rng.randn(3, 32, 32) + 1j * rng.randn(3, 32, 32)).astype(np.complex64)
  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=False))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)

  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=True))
  want = np.fft.ifft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_dft2_roundtrip(rng):
  x = (rng.randn(2, 64, 64) + 1j * rng.randn(2, 64, 64)).astype(np.complex64)
  back = np.asarray(jfft._dft2(jfft._dft2(jnp.asarray(x), False), True))
  np.testing.assert_allclose(back, x, atol=5e-4)


def test_dft2_rectangular(rng):
  x = (rng.randn(1, 16, 32) + 1j * rng.randn(1, 16, 32)).astype(np.complex64)
  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=False))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_dft2_radix_split_matches_fft(rng, monkeypatch):
  """Radix-2 Cooley-Tukey splits (the 512+ lowering) vs numpy, exercised
  at a small base so two split levels run."""
  monkeypatch.setattr(jfft, '_RADIX_BASE', 8)
  x = (rng.randn(2, 32, 32) + 1j * rng.randn(2, 32, 32)).astype(np.complex64)
  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=False))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)

  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=True))
  want = np.fft.ifft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_dft2_radix_split_rectangular_odd(rng, monkeypatch):
  """Odd sizes fall back to the dense matmul; even sides still split."""
  monkeypatch.setattr(jfft, '_RADIX_BASE', 8)
  x = (rng.randn(1, 16, 11) + 1j * rng.randn(1, 16, 11)).astype(np.complex64)
  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=False))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_dft2_at_512_matches_fft(rng):
  """One real split level at the paper resolution (default base 256)."""
  x = (rng.randn(1, 512, 512) + 1j * rng.randn(1, 512, 512)) \
      .astype(np.complex64)
  got = np.asarray(jfft._dft2(jnp.asarray(x), inverse=False))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=1e-3)


def test_dft_mode_env_override(rng, monkeypatch):
  monkeypatch.setattr(jfft, '_FFT_MODE', 'dft')
  x = (rng.randn(2, 16, 16) + 1j * rng.randn(2, 16, 16)).astype(np.complex64)
  got = np.asarray(jfft.fft2(jnp.asarray(x)))
  want = np.fft.fft2(x, axes=(-2, -1), norm='ortho')
  np.testing.assert_allclose(got, want, atol=2e-4)


def test_dft_gradients(monkeypatch):
  """DC-style gradients remain correct through the matmul DFT."""
  monkeypatch.setattr(jfft, '_FFT_MODE', 'dft')
  from csmri_refinement_tpu.ops import dc as dc_ops
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
  k0 = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
  mask = jnp.asarray(np.ones((1, 8, 8, 1), np.float32))

  grad = jax.grad(
      lambda x_: jnp.sum(dc_ops.data_consistency(x_, k0, mask)))(x)
  # fully-sampled mask → output independent of x → zero gradient
  np.testing.assert_allclose(np.asarray(grad), 0.0, atol=1e-4)
