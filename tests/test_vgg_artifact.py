"""VGG19 weights-artifact contract tests.

The ImageNet VGG19 artifact itself is unobtainable in this image (no
egress), so the perceptual loss runs with explicit random init here
(NOTES.md). These tests pin the artifact *contract* — expected keys,
shapes, content hash, loud failure on mismatch — and auto-upgrade the
evidence on any image that does carry weights: drop a converted
``vgg19.npz`` at ``resources/models/vgg19.npz`` (or point
``CSMRI_TPU_VGG19_NPZ`` at one) and the gated test loads it, verifies the
embedded hash, and runs calibrated VGG features end to end.

Reference: /root/reference/models/vgg.py:35 (construction-time torchvision
download), configs/2-refinement.json:78-82 (loss weights tuned around
ImageNet features).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.models import vgg

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT_PATHS = [
    os.environ.get('CSMRI_TPU_VGG19_NPZ', ''),
    os.path.join(_REPO, 'resources', 'models', 'vgg19.npz'),
]


def _artifact_path():
  for p in ARTIFACT_PATHS:
    if p and os.path.exists(p):
      return p
  return None


def _fake_raw(rng):
  return {k: rng.randn(*shape).astype(np.float32) * 0.05
          for k, shape in vgg.expected_vgg19_artifact().items()}


def test_contract_shapes_match_torchvision_vgg19():
  # torchvision vgg19 cfg 'E': 16 convs at features indices
  # 0,2,5,7,10,12,14,16,19,21,23,25,28,30,32,34
  shapes = vgg.expected_vgg19_artifact()
  assert len(shapes) == 32  # 16 convs x (weight, bias)
  assert shapes['features.0.weight'] == (64, 3, 3, 3)
  assert shapes['features.28.weight'] == (512, 512, 3, 3)
  assert shapes['features.34.bias'] == (512,)
  torchvision = pytest.importorskip(
      'torchvision', reason='torchvision not in this image')
  sd = torchvision.models.vgg19().state_dict()
  for key, shape in shapes.items():
    assert tuple(sd[key].shape) == shape, key


def test_validate_passes_and_hash_roundtrip(tmp_path):
  rng = np.random.RandomState(0)
  raw = _fake_raw(rng)
  digest = vgg.vgg19_content_hash(raw)
  raw['__sha256__'] = np.asarray(digest)
  vgg.validate_vgg19_raw(raw, 'fake.npz')  # no raise
  assert vgg.vgg19_content_hash(raw) == digest  # hash ignores manifest key


def test_validate_fails_loudly_on_missing_and_shape_and_hash():
  rng = np.random.RandomState(1)
  raw = _fake_raw(rng)
  bad = dict(raw)
  del bad['features.10.weight']
  with pytest.raises(ValueError, match='missing features.10.weight'):
    vgg.validate_vgg19_raw(bad, 'x.npz')

  bad = dict(raw)
  bad['features.0.weight'] = bad['features.0.weight'][:32]
  with pytest.raises(ValueError, match='features.0.weight: shape'):
    vgg.validate_vgg19_raw(bad, 'x.npz')

  bad = dict(raw)
  bad['__sha256__'] = np.asarray('0' * 64)
  with pytest.raises(ValueError, match='content hash'):
    vgg.validate_vgg19_raw(bad, 'x.npz')


def test_converter_embeds_manifest(tmp_path):
  from csmri_refinement_tpu.utils import torch_import
  import torch
  rng = np.random.RandomState(2)
  state = {k: torch.from_numpy(v) for k, v in _fake_raw(rng).items()}
  out = str(tmp_path / 'vgg19.npz')
  torch_import.convert_vgg19(state, out)
  loaded = dict(np.load(out))
  assert '__sha256__' in loaded
  vgg.validate_vgg19_raw(loaded, out)  # hash verifies
  # loader consumes it end to end
  params = vgg.load_vgg19_params(weights_path=out)
  np.testing.assert_allclose(
      np.asarray(params['conv_0']['kernel']),
      np.transpose(loaded['features.0.weight'], (2, 3, 1, 0)))


def test_loader_rejects_corrupt_file(tmp_path):
  rng = np.random.RandomState(3)
  raw = _fake_raw(rng)
  raw['__sha256__'] = np.asarray(vgg.vgg19_content_hash(raw))
  raw['features.5.weight'] = raw['features.5.weight'] + 1.0  # corrupt
  path = str(tmp_path / 'corrupt.npz')
  np.savez(path, **raw)
  with pytest.raises(ValueError, match='content hash'):
    vgg.load_vgg19_params(weights_path=path)


@pytest.mark.slow
@pytest.mark.skipif(_artifact_path() is None,
                    reason='no ImageNet vgg19.npz artifact in this image '
                           '(no egress); drop one at '
                           'resources/models/vgg19.npz to enable')
def test_imagenet_artifact_end_to_end():
  """Runs only on images that carry real converted ImageNet weights."""
  path = _artifact_path()
  params = vgg.load_vgg19_params(weights_path=path)  # validates + hash
  module = vgg.VGG19(output_blocks=(0, 4))
  x = jnp.linspace(0, 1, 2 * 64 * 64 * 3, dtype=jnp.float32) \
      .reshape(2, 64, 64, 3)
  feats = jax.jit(lambda p, v: module.apply({'params': p}, v))(params, x)
  assert feats[0].shape == (2, 64, 64, 64)
  # ImageNet-trained filters produce non-degenerate activations
  assert float(jnp.std(feats[1])) > 1e-3
