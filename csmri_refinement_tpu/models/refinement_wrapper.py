"""RefinementWrapper: frozen pretrained path + learnable residual path.

Rebuild of /root/reference/models/refinement_wrapper.py:95-220 as a flax
module:

* ``mode='add'``: pretrained output + learnable output
  (refinement_wrapper.py:164-167)
* ``mode='real-penalty-add'``: per-example min/max scaling of the
  pretrained real channel to (−1, 1), learnable output scaled by a learned
  scalar (init 0) and added, unscaled back; imaginary channel passes
  through; returns dict {pred, pretrained, prescaled_refinement,
  scaled_refinement} (refinement_wrapper.py:169-194, _scale/_unscale at
  :51-92)
* ``input_mode``: learnable path sees the input / pretrained output /
  concat of both (refinement_wrapper.py:116-124)
* the forward signature follows the pretrained model's batch keys
  (INPUT_KEYS), the explicit version of the reference's signature
  inspection (refinement_wrapper.py:131-144)
* freezing: ``stop_gradient`` around the pretrained path
  (refinement_wrapper.py:196-220 detach semantics); the pretrained
  parameter subtree then receives exactly-zero gradients, so Adam leaves it
  unchanged — the functional analogue of excluding frozen params from
  ``parameters()`` (refinement_wrapper.py:146-162). Runners additionally
  report trainable-vs-frozen counts from this structure.

Pretrained weights are grafted into the ``pretrained_model`` parameter
subtree after init by the runner (see
training.model_setup.apply_pretrained_weights), from the checkpoint path in
the sub-config (refinement_wrapper.py:27-44).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from csmri_refinement_tpu.models import construct_model as build_model
from csmri_refinement_tpu.utils.config import Configuration

REQUIRED_PARAMS = ['pretrained_model', 'learnable_model']
OPTIONAL_PARAMS = ['mode', 'input_mode', 'freeze_pretrained_model']
KEY_RENAMES = {
    'pretrained_model': 'pretrained_model_conf',
    'learnable_model': 'learnable_model_conf',
}


def construct_model(conf, model_name, **kwargs):
  params = conf.to_param_dict(REQUIRED_PARAMS, OPTIONAL_PARAMS, KEY_RENAMES)
  pretrained_conf = Configuration.from_dict(params['pretrained_model_conf'],
                                            conf)
  learnable_conf = Configuration.from_dict(params['learnable_model_conf'],
                                           conf)
  # Thread the undersampling section down to the wrapped models (RecNet
  # derives the exact skinny-DC lowering from it, models/recnet.py), and
  # the compute dtype (mixed-precision training sets it at the wrapper
  # level; explicit sub-model dtypes win).
  for sub in (pretrained_conf, learnable_conf):
    if conf.has_attr('undersampling') and not sub.has_attr('undersampling'):
      sub.undersampling = conf.undersampling
    if conf.has_attr('dtype') and not sub.has_attr('dtype'):
      sub.dtype = conf.dtype
  pretrained = build_model(pretrained_conf, pretrained_conf.name)
  learnable = build_model(learnable_conf, learnable_conf.name)

  return RefinementWrapper(
      pretrained_model=pretrained,
      learnable_model=learnable,
      mode=params.get('mode', 'add'),
      input_mode=params.get('input_mode', 'input'),
      freeze_pretrained_model=params.get('freeze_pretrained_model', True))


def _scale(tensor):
  """Per-example/channel min-max scale to (−1, 1); returns (scaled, min,
  max-after-min) (refinement_wrapper.py:51-73)."""
  b, h, w, c = tensor.shape
  flat = tensor.reshape(b, h * w, c)
  minimum = jnp.min(flat, axis=1, keepdims=True)
  flat = flat - minimum
  maximum = jnp.max(flat, axis=1, keepdims=True)
  flat = flat / maximum
  flat = flat * 2.0 - 1.0
  return flat.reshape(b, h, w, c), minimum, maximum


def _unscale(tensor, minimum, maximum):
  """(−1, 1) → original range (refinement_wrapper.py:76-92). The result may
  exceed the original range after the residual add — intentional
  (refinement_wrapper.py:182-186)."""
  b, h, w, c = tensor.shape
  flat = tensor.reshape(b, h * w, c)
  flat = (flat + 1.0) / 2.0
  flat = flat * maximum + minimum
  return flat.reshape(b, h, w, c)


class RefinementWrapper(nn.Module):
  pretrained_model: Any
  learnable_model: Any
  mode: str = 'add'
  input_mode: str = 'input'
  freeze_pretrained_model: bool = True

  HAS_TRAIN_ARG = True

  @property
  def INPUT_KEYS(self):
    return getattr(self.pretrained_model, 'INPUT_KEYS', ('inp',))

  def _learnable_input(self, inp, out_pretrained):
    if self.input_mode == 'input':
      return inp
    if self.input_mode == 'output':
      return out_pretrained
    if self.input_mode == 'concat':
      return jnp.concatenate([inp, out_pretrained], axis=-1)
    raise ValueError('Unknown input mode {}'.format(self.input_mode))

  def _apply_learnable(self, x, train):
    if getattr(self.learnable_model, 'HAS_TRAIN_ARG', False):
      return self.learnable_model(x, train=train)
    return self.learnable_model(x)

  @nn.compact
  def __call__(self, inp, *extra_inputs, train=False):
    assert self.mode in ('add', 'real-penalty-add'), \
        'Unknown mode {}'.format(self.mode)

    if self.freeze_pretrained_model:
      inp = jax.lax.stop_gradient(inp)
      extra_inputs = tuple(jax.lax.stop_gradient(x) for x in extra_inputs)

    if getattr(self.pretrained_model, 'HAS_TRAIN_ARG', False):
      out_pretrained = self.pretrained_model(inp, *extra_inputs,
                                             train=False)
    else:
      out_pretrained = self.pretrained_model(inp, *extra_inputs)
    if isinstance(out_pretrained, dict):
      out_pretrained = out_pretrained['pred']
    if self.freeze_pretrained_model:
      out_pretrained = jax.lax.stop_gradient(out_pretrained)

    if self.mode == 'add':
      learn_input = self._learnable_input(inp, out_pretrained)
      out_learnable = self._apply_learnable(learn_input, train)
      return out_pretrained + out_learnable

    # real-penalty-add
    pretrained_real = out_pretrained[..., 0:1]
    pretrained_imag = out_pretrained[..., 1:2]

    pretrained_real_scaled, minimum, maximum = _scale(pretrained_real)

    learn_input = self._learnable_input(inp, out_pretrained)
    out_learnable = self._apply_learnable(learn_input, train)

    scale = self.param('scale', nn.initializers.zeros, (1,))
    out_learnable_scaled = scale * out_learnable
    refined = pretrained_real_scaled + out_learnable_scaled

    out_real = _unscale(refined, minimum, maximum)

    return {
        'pred': jnp.concatenate([out_real, pretrained_imag], axis=-1),
        'pretrained': out_pretrained,
        'prescaled_refinement': out_learnable,
        'scaled_refinement': out_learnable_scaled,
    }
