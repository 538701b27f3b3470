"""Pretrained-weight grafting into (sub-)model parameter subtrees.

Covers the reference's ``pretrained_weights: [path, model_key]`` mechanism
(utils/checkpoints.py:96-121): a model config (or, for RefinementWrapper,
its ``pretrained_model``/``learnable_model`` sub-configs,
refinement_wrapper.py:27-44) names another run's checkpoint whose extracted
sub-model state initializes the corresponding parameter subtree. Paths are
relative to the declaring config file.
"""

import logging

from flax import serialization

from csmri_refinement_tpu.utils.checkpoints import resolve_pretrained_weights
from csmri_refinement_tpu.utils.config import Configuration


def _graft(state, loaded, subtree_path=()):
  """Graft loaded {'params':..., 'batch_stats':...} into state at path."""
  for collection in ('params', 'batch_stats'):
    if collection not in loaded or loaded[collection] in (None, {}):
      continue
    target = state[collection]
    node = target
    for key in subtree_path[:-1]:
      node = node[key]
    if subtree_path:
      leaf_key = subtree_path[-1]
      if leaf_key not in node:
        if collection == 'batch_stats':
          continue  # sub-model without batch stats
        raise KeyError('No parameter subtree {} to graft into'.format(
            '/'.join(subtree_path)))
      node[leaf_key] = serialization.from_state_dict(node[leaf_key],
                                                     loaded[collection])
    else:
      state[collection] = serialization.from_state_dict(
          target, loaded[collection])


def apply_pretrained_weights(state, model_conf, conf_file):
  """Initialize subtrees of ``state`` from configured checkpoints.

  ``state`` is the runner's {'params':..., 'batch_stats':...} dict (plain
  mutable dicts). Handles both the root model and RefinementWrapper
  sub-models.
  """
  if model_conf.has_attr('pretrained_weights'):
    loaded = resolve_pretrained_weights(model_conf, conf_file)
    if loaded is not None:
      _graft(state, _normalize_loaded(loaded))

  for sub_key in ('pretrained_model', 'learnable_model'):
    sub = model_conf.get_attr(sub_key)
    if isinstance(sub, dict) and 'pretrained_weights' in sub:
      sub_conf = Configuration.from_dict(sub, model_conf)
      loaded = resolve_pretrained_weights(sub_conf, conf_file)
      if loaded is not None:
        _graft(state, _normalize_loaded(loaded), (sub_key,))
        logging.info('Grafted pretrained weights into subtree %s', sub_key)


def _normalize_loaded(loaded):
  """Accept either {'params':...,'batch_stats':...} or a bare params tree."""
  if 'params' in loaded:
    return loaded
  return {'params': loaded}
