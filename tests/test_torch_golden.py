"""Golden tests against torch (CPU): the reference's numerics as oracle.

The reference computes losses/metrics with torch ops; these tests verify
our jittable implementations reproduce them bit-closely on shared inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from csmri_refinement_tpu.models import criteria  # noqa: E402
from csmri_refinement_tpu.models.adversarial_loss import GANLoss  # noqa: E402
from csmri_refinement_tpu.models.layers import same_pad  # noqa: E402
from csmri_refinement_tpu.ops import ssim as ssim_ops  # noqa: E402


def test_ssim_matches_pytorch_ssim_formula(rng):
  """Our SSIM vs the vendored pytorch_ssim math
  (reference metrics/pytorch_ssim/__init__.py:22-78) executed in torch."""
  import torch.nn.functional as F
  from math import exp

  img1 = rng.rand(2, 16, 16, 1).astype(np.float32)
  img2 = np.clip(img1 + 0.1 * rng.randn(2, 16, 16, 1), 0, 1) \
      .astype(np.float32)

  # torch-side computation (NCHW), faithful to the vendored code
  window_size, sigma = 11, 1.5
  gauss = torch.tensor([exp(-(x - window_size // 2) ** 2 /
                            (2 * sigma ** 2)) for x in range(window_size)])
  gauss = gauss / gauss.sum()
  w2d = gauss.unsqueeze(1).mm(gauss.unsqueeze(0)).float()
  window = w2d.expand(1, 1, window_size, window_size).contiguous()

  t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
  t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
  pad = window_size // 2
  mu1 = F.conv2d(t1, window, padding=pad, groups=1)
  mu2 = F.conv2d(t2, window, padding=pad, groups=1)
  mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
  s1 = F.conv2d(t1 * t1, window, padding=pad) - mu1_sq
  s2 = F.conv2d(t2 * t2, window, padding=pad) - mu2_sq
  s12 = F.conv2d(t1 * t2, window, padding=pad) - mu1_mu2
  c1, c2 = 0.01 ** 2, 0.03 ** 2
  want = (((2 * mu1_mu2 + c1) * (2 * s12 + c2)) /
          ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))).mean().item()

  got = float(ssim_ops.ssim(jnp.asarray(img1), jnp.asarray(img2)))
  assert abs(got - want) < 1e-5


def test_cross_entropy_matches_torch(rng):
  logits = rng.randn(2, 8, 8, 3).astype(np.float32)
  labels = rng.randint(0, 3, (2, 8, 8))

  want = torch.nn.functional.cross_entropy(
      torch.from_numpy(logits.transpose(0, 3, 1, 2)),
      torch.from_numpy(labels)).item()
  got = float(criteria.cross_entropy_loss(jnp.asarray(logits),
                                          jnp.asarray(labels)))
  assert abs(got - want) < 1e-5


def test_smooth_l1_matches_torch(rng):
  a = rng.randn(2, 8, 8, 2).astype(np.float32)
  b = rng.randn(2, 8, 8, 2).astype(np.float32)
  want = torch.nn.functional.smooth_l1_loss(
      torch.from_numpy(a), torch.from_numpy(b)).item()
  got = float(criteria.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
  assert abs(got - want) < 1e-5


def test_gan_bce_matches_torch(rng):
  probs = rng.rand(2, 4, 4, 1).astype(np.float32)
  probs_real = rng.rand(2, 4, 4, 1).astype(np.float32)
  smoothing = 0.1

  # reference GANLoss disc: BCE(fake, 0) + BCE(real, 1 - smoothing)
  bce = torch.nn.functional.binary_cross_entropy
  tf, tr = torch.from_numpy(probs), torch.from_numpy(probs_real)
  want = (bce(tf, torch.zeros_like(tf)) +
          bce(tr, torch.full_like(tr, 1.0 - smoothing))).item()

  loss = GANLoss('disc', disc_label_smoothing=smoothing)
  got = float(loss({'prob': jnp.asarray(probs)},
                   {'prob': jnp.asarray(probs_real)}))
  assert abs(got - want) < 1e-4

  gen_loss = GANLoss('gen')
  want_gen = bce(tf, torch.ones_like(tf)).item()
  got_gen = float(gen_loss({'prob': jnp.asarray(probs)}, None))
  assert abs(got_gen - want_gen) < 1e-4


@pytest.mark.parametrize('kernel_size,stride', [(3, 1), (4, 1), (4, 2),
                                                (3, 2)])
def test_same_padding_matches_torch_formula(rng, kernel_size, stride):
  """Our same_pad + VALID conv output equals torch pad + Conv2d with the
  reference's SAME-padding formula (models/utils.py:58-85) and identical
  weights."""
  import math
  import torch.nn as nn_t
  import jax
  import flax.linen as nn

  x = rng.randn(1, 16, 16, 3).astype(np.float32)
  w = rng.randn(8, 3, kernel_size, kernel_size).astype(np.float32)  # OIHW

  # torch: reference padding layer then conv
  total = int(math.ceil((kernel_size - 1.0) / stride))
  side = total // 2
  if total % 2 == 0:
    pad = (side, side, side, side)
  else:
    pad = (side, side + 1, side, side + 1)
  tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
  tx = torch.nn.functional.pad(tx, pad)
  conv = nn_t.Conv2d(3, 8, kernel_size, stride=stride, bias=False)
  with torch.no_grad():
    conv.weight.copy_(torch.from_numpy(w))
  want = conv(tx).detach().numpy().transpose(0, 2, 3, 1)

  # ours: same_pad + flax VALID conv with the same weights (HWIO)
  jx = same_pad(jnp.asarray(x), kernel_size, stride, mode='zero')
  kernel = jnp.asarray(w.transpose(2, 3, 1, 0))
  got = jax.lax.conv_general_dilated(
      jx, kernel, (stride, stride), 'VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_reflection_padding_matches_torch(rng):
  x = rng.randn(1, 8, 8, 2).astype(np.float32)
  tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
  want = torch.nn.functional.pad(tx, (1, 2, 1, 2), mode='reflect') \
      .numpy().transpose(0, 2, 3, 1)
  got = same_pad(jnp.asarray(x), kernel_size=4, stride=1, mode='reflection')
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_pixelshuffle_matches_torch(rng):
  from csmri_refinement_tpu.models.unet import _pixel_shuffle
  x = rng.randn(1, 4, 4, 8).astype(np.float32)
  tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
  want = torch.nn.functional.pixel_shuffle(tx, 2).numpy() \
      .transpose(0, 2, 3, 1)
  got = _pixel_shuffle(jnp.asarray(x), 2)
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


@pytest.mark.parametrize('mode', ['reflection', 'replication'])
@pytest.mark.parametrize('kernel_size', [3, 4, 5])
def test_same_conv_fast_path_equals_materialized(rng, mode, kernel_size):
  """The border-fixup fast path must equal conv over a fully materialized
  reflect/replicate pad."""
  import jax
  import flax.linen as nn
  from csmri_refinement_tpu.models.layers import same_conv, same_pad

  x = jnp.asarray(rng.randn(2, 12, 12, 3).astype(np.float32))
  conv = nn.Conv(5, (kernel_size, kernel_size), strides=1, padding='VALID')
  variables = conv.init(jax.random.PRNGKey(0),
                        same_pad(x, kernel_size, 1, mode))

  want = conv.apply(variables, same_pad(x, kernel_size, 1, mode))
  got = same_conv(lambda v: conv.apply(variables, v), x, kernel_size, mode)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
