"""VGG19 feature extractor for perceptual losses.

Rebuild of /root/reference/models/vgg.py:8-80: the torchvision VGG19
``features`` stack sliced into ≤6 blocks, each ending right before a
max-pool (the pool opens the next block, vgg.py:37-43), with ImageNet
mean/std input normalization (vgg.py:48-54, 68-72).

Weight provenance: torchvision downloads ImageNet weights at construction
(vgg.py:35); this environment has no torchvision/egress, so weights load
from a local file when configured (``vgg_weights_path``: either an .npz of
``features.{i}.weight/bias`` arrays or a torch-loadable state dict, OIHW
kernels converted to HWIO) and otherwise fall back to a deterministic
random init with a warning — the loss stays trainable/testable, only
perceptual quality needs the real weights.
"""

import logging
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19 cfg 'E' conv plan; 'M' = max-pool
_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
        512, 512, 512, 512, 'M', 512, 512, 512, 512, 'M']

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

LAST_FEATURE_MAP = 4  # default block index (vgg.py:11)


class VGG19(nn.Module):
  """Returns the requested block outputs for a (B, H, W, 3) input in (0,1)."""
  output_blocks: Sequence[int] = (LAST_FEATURE_MAP,)
  dtype: Any = None

  LAST_FEATURE_MAP = LAST_FEATURE_MAP

  @nn.compact
  def __call__(self, inp):
    output_blocks = sorted(self.output_blocks)
    assert len(output_blocks) >= 1, 'Need at least one output block'
    last_needed_block = output_blocks[-1]
    assert last_needed_block <= 5, 'VGG19 has at most 6 blocks'

    mean = jnp.asarray(_IMAGENET_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(_IMAGENET_STD).reshape(1, 1, 1, 3)
    x = (inp - mean) / std

    out = []
    block_idx = 0
    conv_idx = 0
    for item in _CFG:
      if item == 'M':
        # A max-pool closes the current block (its output is x pre-pool)
        if block_idx in output_blocks:
          out.append(x)
        if block_idx == last_needed_block:
          break
        block_idx += 1
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
      else:
        x = nn.Conv(item, (3, 3), strides=1, padding=1,
                    dtype=self.dtype, name='conv_{}'.format(conv_idx))(x)
        x = nn.relu(x)
        conv_idx += 1

    # Block 5 is the pool-only block after the final conv (vgg.py:24-26)
    if last_needed_block == 5 and 5 in output_blocks:
      out.append(x)

    return out


def expected_vgg19_artifact():
  """The weights-artifact contract: {torch key: shape} for every tensor a
  converted ``vgg19.npz`` must contain.

  Source artifact: torchvision ``vgg19`` IMAGENET1K_V1
  (``vgg19-dcbb9e9d.pth`` — torchvision names release files with the
  first 8 hex chars of their sha256, so the source download is integrity-
  checked by torchvision itself). The conversion
  (utils/torch_import.convert_vgg19) embeds a ``__sha256__`` content hash
  computed by :func:`vgg19_content_hash`; re-converting the same source on
  any machine reproduces it, making weight provenance verifiable offline.
  """
  shapes = {}
  conv_idx, cin = 0, 3
  for item in _CFG:
    if item == 'M':
      continue
    ti = _torch_layer_index(conv_idx)
    shapes['features.{}.weight'.format(ti)] = (item, cin, 3, 3)  # OIHW
    shapes['features.{}.bias'.format(ti)] = (item,)
    cin = item
    conv_idx += 1
  return shapes


def vgg19_content_hash(raw):
  """Deterministic sha256 over the weight values (key-sorted f32 bytes).

  Stable across numpy versions / npz compression — hashes content, not
  container bytes.
  """
  import hashlib
  h = hashlib.sha256()
  for key in sorted(expected_vgg19_artifact()):
    h.update(np.ascontiguousarray(np.asarray(raw[key], np.float32)).tobytes())
  return h.hexdigest()


def validate_vgg19_raw(raw, path):
  """Fail loudly when a weights file does not match the artifact contract."""
  problems = []
  for key, shape in expected_vgg19_artifact().items():
    if key not in raw:
      problems.append('missing {}'.format(key))
    elif tuple(np.asarray(raw[key]).shape) != shape:
      problems.append('{}: shape {} != expected {}'.format(
          key, tuple(np.asarray(raw[key]).shape), shape))
  if problems:
    raise ValueError(
        'VGG19 weights file {!r} does not match the torchvision vgg19 '
        'artifact contract (see models/vgg.py:expected_vgg19_artifact):\n  '
        .format(path) + '\n  '.join(problems))
  if '__sha256__' in raw:
    want = str(np.asarray(raw['__sha256__']).item())
    got = vgg19_content_hash(raw)
    if got != want:
      raise ValueError(
          'VGG19 weights file {!r} failed its embedded content hash: '
          'sha256 {} != recorded {} — file corrupted or edited after '
          'conversion'.format(path, got, want))
    logging.info('VGG19 weights content hash verified: %s', want)
  else:
    logging.warning(
        'VGG19 weights file %s has no embedded __sha256__ manifest '
        '(pre-contract conversion?) — shapes validated, content '
        'unverified; re-convert with utils.torch_import to embed it', path)


def load_vgg19_params(weights_path=None, conf_path=None, rng_seed=0,
                      allow_random_init=False):
  """Initialize VGG19 params, from a weights file when available.

  Returns a flax params dict for :class:`VGG19`.

  A config that names VGG19 in its losses has its loss weights tuned around
  ImageNet features (reference configs/2-refinement.json:78-82), so a
  missing weights file is an error unless the user explicitly opts into
  uncalibrated features with ``vgg_random_init: true``.
  """
  module = VGG19(output_blocks=(5,))
  dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
  params = module.init(jax.random.PRNGKey(rng_seed), dummy)['params']

  if weights_path is None:
    if not allow_random_init:
      raise ValueError(
          'VGG19 perceptual loss requires pretrained weights: set '
          '"vgg_weights_path" to a converted weights file (see '
          'csmri_refinement_tpu.utils.torch_import.convert_vgg19), or set '
          '"vgg_random_init": true to explicitly accept a deterministic '
          'random init (functional but not ImageNet-calibrated).')
    logging.warning(
        'VGG19: using deterministic random init (vgg_random_init) — '
        'perceptual loss is functional but not ImageNet-calibrated')
    return params

  if not os.path.isabs(weights_path) and conf_path:
    weights_path = os.path.join(os.path.dirname(conf_path), weights_path)

  raw = _load_torch_style_weights(weights_path)
  validate_vgg19_raw(raw, weights_path)
  conv_idx = 0
  new_params = dict(params)
  for layer_i, item in enumerate(_CFG):
    if item == 'M':
      continue
    w_key = 'features.{}.weight'.format(_torch_layer_index(conv_idx))
    b_key = 'features.{}.bias'.format(_torch_layer_index(conv_idx))
    w = np.asarray(raw[w_key])  # OIHW
    b = np.asarray(raw[b_key])
    name = 'conv_{}'.format(conv_idx)
    new_params[name] = {
        'kernel': jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # → HWIO
        'bias': jnp.asarray(b),
    }
    conv_idx += 1
  logging.info('Loaded VGG19 weights from %s', weights_path)
  return new_params


def _torch_layer_index(conv_idx):
  """Map conv counter → torchvision features index (convs at 0,2,5,7,...)."""
  idx = 0
  count = 0
  for item in _CFG:
    if item == 'M':
      idx += 1
      continue
    if count == conv_idx:
      return idx
    idx += 2  # conv + relu
    count += 1
  raise ValueError(conv_idx)


def _load_torch_style_weights(path):
  if path.endswith('.npz'):
    return dict(np.load(path))
  import torch
  state = torch.load(path, map_location='cpu', weights_only=True)
  if hasattr(state, 'state_dict'):
    state = state.state_dict()
  return {k: v.numpy() for k, v in state.items()
          if k.startswith('features.')}
