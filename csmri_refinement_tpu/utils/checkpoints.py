"""Pytree checkpointing with periodic/best/prune/pretrained-subtree semantics.

Functional equivalent of the reference checkpoint layer
(/root/reference/utils/checkpoints.py:9-121), with `torch.save` replaced by
flax msgpack serialization of pure pytrees (device-independent by
construction — no map_location dance needed).

Checkpoint layout (mirrors reference save_checkpoint at checkpoints.py:9-16)::

    {
      'conf': <resolved config dict>,
      'runner': <runner.state_dict() — nested dict of numpy arrays>,
      'epoch': int,
      'best_val_metrics': {metric_name: float},
    }
"""

import logging
import os

import jax
import numpy as np
from flax import serialization

from csmri_refinement_tpu.utils.checkpoint_paths import is_checkpoint_path


def _to_host(tree):
  """Convert all array leaves to numpy so msgpack can serialize them."""
  def convert(x):
    if isinstance(x, (jax.Array, np.ndarray)):
      return np.asarray(x)
    if isinstance(x, (np.floating, np.integer)):
      return x.item()
    return x
  return jax.tree_util.tree_map(convert, tree)


def _encode_metrics(best_val_metrics):
  """Best metrics → plain floats + direction tag (Metric objects carry
  comparison direction; msgpack needs plain types)."""
  from csmri_refinement_tpu.metrics.metric import Metric, MinMetric
  out = {}
  for name, value in (best_val_metrics or {}).items():
    if isinstance(value, Metric):
      out[name] = {'value': float(value.value),
                   'direction': 'min' if isinstance(value, MinMetric)
                   else 'max'}
    else:
      out[name] = {'value': float(value), 'direction': 'max'}
  return out


def _decode_metrics(encoded):
  from csmri_refinement_tpu.metrics.metric import MaxMetric, MinMetric
  out = {}
  for name, entry in (encoded or {}).items():
    if isinstance(entry, dict):
      cls = MinMetric if entry.get('direction') == 'min' else MaxMetric
      out[name] = cls(float(entry['value']))
    else:
      out[name] = MaxMetric(float(entry))
  return out


def save_checkpoint(path, conf, runner, epoch, best_val_metrics):
  """Serialize {conf, runner state, epoch, best metrics} to ``path``."""
  state = {
      'conf': conf.to_dict() if hasattr(conf, 'to_dict') else dict(conf),
      'runner': _to_host(runner.state_dict()),
      'epoch': int(epoch),
      'best_val_metrics': _encode_metrics(best_val_metrics),
  }
  data = serialization.msgpack_serialize(state)
  tmp_path = path + '.tmp'
  with open(tmp_path, 'wb') as f:
    f.write(data)
  os.replace(tmp_path, path)


def load_checkpoint(path):
  """Load a raw checkpoint dict from disk."""
  with open(path, 'rb') as f:
    return serialization.msgpack_restore(f.read())


def restore_checkpoint(checkpoint_path, runner):
  """Restore a runner's state; returns {conf, start_epoch, best_val_metrics}."""
  checkpoint = load_checkpoint(checkpoint_path)
  runner.load_state_dict(checkpoint['runner'])

  state = {'conf': checkpoint.get('conf')}
  if 'epoch' in checkpoint:
    state['start_epoch'] = int(checkpoint['epoch'])
  if 'best_val_metrics' in checkpoint:
    state['best_val_metrics'] = _decode_metrics(
        checkpoint['best_val_metrics'])
  return state


def inference_checkpoint_from_training_checkpoint(checkpoint, runner_type):
  """Strip optimizer/discriminator state for deployment.

  Matches reference utils/checkpoints.py:44-62: standard keeps ``model``,
  adversarial keeps ``generator``.
  """
  inference_net_by_runner_type = {
      'standard': 'model',
      'adversarial': 'generator',
  }
  assert runner_type in inference_net_by_runner_type, \
      'Unknown runner_type {}'.format(runner_type)

  inference_net = inference_net_by_runner_type[runner_type]
  assert inference_net in checkpoint['runner'], \
      'Checkpoint does not support runner_type {}'.format(runner_type)

  return {
      'conf': checkpoint['conf'],
      'runner': {inference_net: checkpoint['runner'][inference_net]},
  }


def save_raw_checkpoint(path, checkpoint):
  """Write an already-assembled checkpoint dict (deploy tool)."""
  with open(path, 'wb') as f:
    f.write(serialization.msgpack_serialize(_to_host(checkpoint)))


def prune_checkpoints(run_dir, num_checkpoints_to_retain=1):
  """Delete oldest checkpoints beyond the retention count
  (reference utils/checkpoints.py:65-75)."""
  checkpoints = [f for f in os.listdir(run_dir) if is_checkpoint_path(f)]
  excess = len(checkpoints) - num_checkpoints_to_retain
  if excess > 0:
    for f in sorted(checkpoints)[:excess]:
      chkpt_path = os.path.join(run_dir, f)
      try:
        os.remove(chkpt_path)
      except OSError:
        logging.warning('Could not remove old checkpoint %s', chkpt_path)


def load_model_state_dict(checkpoint_path, model_key):
  """Extract a named sub-model's state from another run's checkpoint."""
  checkpoint = load_checkpoint(checkpoint_path)
  if 'runner' not in checkpoint:
    raise ValueError(
        'Did not find runner in checkpoint {}'.format(checkpoint_path))
  runner_state = checkpoint['runner']
  if model_key not in runner_state:
    raise ValueError('Did not find model {} in checkpoint {}'.format(
        model_key, checkpoint_path))
  return runner_state[model_key]


def resolve_pretrained_weights(model_conf, conf_path):
  """Load pretrained variables declared via ``pretrained_weights: [path, key]``.

  Paths are relative to the config file that declared them (reference
  utils/checkpoints.py:96-121). Returns the variables pytree or None when
  the config explicitly disables loading (``pretrained_weights: null``).
  """
  assert model_conf.has_attr('pretrained_weights'), \
      ('Can not initialize {} with pretrained weights: missing config key '
       '"pretrained_weights" with checkpoint path').format(
           model_conf.get_attr('name'))

  if model_conf.pretrained_weights is None:
    logging.info('Skipping loading pretrained weights for %s '
                 '(explicitly disabled)', model_conf.get_attr('name'))
    return None

  path, model_key = model_conf.pretrained_weights
  if not os.path.isabs(path) and conf_path is not None:
    path = os.path.join(os.path.dirname(conf_path), path)
  variables = load_model_state_dict(path, model_key)
  logging.info('Loaded pretrained weights from checkpoint %s, key %s',
               path, model_key)
  return variables
