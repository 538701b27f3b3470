"""BaseRunner: template-method training engine over jitted steps.

Rebuild of /root/reference/training/base_runner.py:13-203. The epoch loop,
metric accumulation, and validation/inference loops match the reference; the
per-step work is a single compiled XLA program per runner (subclasses build
it), instead of eager per-op dispatch:

* batch fetch: host loader hands numpy dicts; the jitted step moves them to
  device and (for reconstruction) runs the on-device forward model — there
  is no cudaify equivalent, sharding/jit place the data
* model input binding: via each model's ``INPUT_KEYS``, replacing the
  reference's forward-signature inspection (base_runner.py:43-63)
* loss weighting: dict of per-criterion weights folded into the compiled
  total-loss (reference assembles a weight vector, base_runner.py:19-27)
"""

import logging
from itertools import chain

import jax
import numpy as np

from csmri_refinement_tpu.metrics import accumulate_metric
from csmri_refinement_tpu.utils import host_fetch


def cast_outputs_f32(tree):
  """f32 loss epilogue for mixed-precision training: cast floating network
  outputs to float32 at the loss boundary so every criterion's reductions
  accumulate in f32 even when the networks compute in bf16 (`train_dtype`
  config key). Identity for f32 models — same-dtype astype is a no-op, so
  the f32 training graph is unchanged."""
  import jax.numpy as jnp

  def _cast(x):
    if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != jnp.float32:
      return x.astype(jnp.float32)
    return x
  return jax.tree.map(_cast, tree)


class BaseRunner:
  def __init__(self, conf, mode):
    self.conf = conf
    self.mode = mode
    self.epoch = 0
    # Ragged batch held back by _collect_stackable_batches for the next
    # _train_step call (steps_per_fetch mode; loaders default to
    # drop_last=False, so a short final batch is routine).
    self._pending_host_batch = None

  def _collect_stackable_batches(self, batch_iter, k):
    """Pull up to k host batches with EQUAL leading dims (np.stack-able
    for the steps_per_fetch scan). A batch whose size differs from the
    chunk's first is held back and returned alone on the next call —
    never dropped, never crashing the stack."""

    def _batch_len(hb):
      return len(next(iter(hb.values())))

    host_batches = []
    while len(host_batches) < k:
      if self._pending_host_batch is not None:
        host_batch = self._pending_host_batch
        self._pending_host_batch = None
      else:
        host_batch = next(batch_iter, None)
      if host_batch is None:
        break
      if host_batches and _batch_len(host_batch) != \
          _batch_len(host_batches[0]):
        self._pending_host_batch = host_batch
        break
      host_batches.append(host_batch)
    return host_batches

  def _preshard_host_batch(self, host_batch):
    """Multi-process (multi-controller) mesh runs lift the process-local
    host batch to the GLOBAL array before the on-device forward model, so
    per-example mask keys stay positional over the global batch and the
    training trajectory matches a single-process run exactly. Single
    process (or no mesh): returns the batch unchanged — the usual
    prepare-then-shard order applies."""
    mesh = getattr(self, 'mesh', None)
    from csmri_refinement_tpu.parallel import multiprocess, shard_batch
    if mesh is None or not multiprocess():
      return host_batch
    assert getattr(self.preparer, 'device_pure', True), \
        ('Multi-process training needs a jit-pure batch preparer '
         '(host-side radial mask generation cannot span processes)')
    return shard_batch(host_batch, mesh)

  # -- subclass hooks ---------------------------------------------------------

  def _train_step(self, batch_iter):
    """Consume one or more batches from ``batch_iter`` and run update(s);
    returns (num_batches_consumed, loss_metrics, data) where data is
    consumed by _compute_train_metrics. Mirrors the reference's
    _request_data pull model (base_runner.py:29-41), which lets the
    adversarial runner train multiple updates per step."""
    raise NotImplementedError

  def _val_step(self, batch, compute_metrics=True):
    raise NotImplementedError

  def _compute_train_metrics(self, data):
    raise NotImplementedError

  def _compute_test_metrics(self, data):
    raise NotImplementedError

  def get_named_outputs(self, data):
    """Translate step data to {input, prediction, target, ...} for
    summaries/output saving."""
    raise NotImplementedError

  def get_named_models(self):
    raise NotImplementedError

  def state_dict(self):
    raise NotImplementedError

  def load_state_dict(self, state_dict):
    raise NotImplementedError

  def predict(self, batch):
    raise NotImplementedError

  def epoch_beginning(self, epoch):
    pass

  def epoch_finished(self, epoch):
    pass

  # -- engine -----------------------------------------------------------------

  def train_epoch(self, loader, epoch, summary_writer=None,
                  steps_per_train_summary=1, verbose=False):
    self.epoch = epoch
    num_batches_per_epoch = len(loader)
    epoch_loss_metrics = {}
    epoch_metrics = {}

    current_batch = 0
    batch_iter = iter(loader)
    while current_batch < num_batches_per_epoch:
      num_batches, loss_metrics, data = self._train_step(batch_iter)
      if num_batches == 0:
        break
      current_batch += num_batches

      metrics = self._compute_train_metrics(data)
      del data

      for name, loss_metric in loss_metrics.items():
        accumulate_metric(epoch_loss_metrics, name, loss_metric)
      for name, metric in metrics.items():
        accumulate_metric(epoch_metrics, name, metric)

      global_step = num_batches_per_epoch * (epoch - 1) + current_batch
      if current_batch % steps_per_train_summary == 0:
        s = '===> Epoch[{}]({}/{}): '.format(epoch, current_batch,
                                             num_batches_per_epoch)
        s += ', '.join('{}: {}'.format(name, metric)
                       for name, metric in loss_metrics.items())
        if verbose:
          s += '\n' + '\n'.join('     {}: {}'.format(name, metric)
                                for name, metric in metrics.items())
        logging.info(s)

        if summary_writer is not None:
          for name, metric in chain(loss_metrics.items(), metrics.items()):
            summary_writer.add_scalar('train/{}'.format(name), metric.value,
                                      global_step)

    value_by_loss = {name: m.average()
                     for name, m in epoch_loss_metrics.items()}
    value_by_metric = {name: m.average() for name, m in epoch_metrics.items()}
    return value_by_loss, value_by_metric

  def validate(self, loader, num_batches_to_return=0):
    epoch_data = []
    epoch_loss_metrics = {}
    epoch_metrics = {}

    for batch in loader:
      loss_metrics, data = self._val_step(batch)
      if data is None:
        break

      if len(epoch_data) < num_batches_to_return:
        epoch_data.append(host_fetch(data))

      metrics = self._compute_test_metrics(data)
      del data

      for name, loss_metric in loss_metrics.items():
        accumulate_metric(epoch_loss_metrics, name, loss_metric)
      for name, metric in metrics.items():
        accumulate_metric(epoch_metrics, name, metric)

    value_by_loss = {name: m.average()
                     for name, m in epoch_loss_metrics.items()}
    value_by_metric = {name: m.average() for name, m in epoch_metrics.items()}
    return epoch_data, value_by_loss, value_by_metric

  def infer(self, loader):
    epoch_data = []
    for batch in loader:
      _, data = self._val_step(batch, compute_metrics=False)
      if data is None:
        break
      epoch_data.append(host_fetch(data))
    return epoch_data

  # -- helpers ----------------------------------------------------------------

  @staticmethod
  def _scalar(x):
    return float(np.asarray(x))

  @staticmethod
  def _loss_weights(weights_by_criterion, *criteria_dicts):
    """Per-criterion weight dict, default 1.0 (reference
    base_runner.py:19-27 builds a vector; order-independence by name here)."""
    weights = {}
    for criteria in criteria_dicts:
      for name in criteria:
        weights[name] = float(weights_by_criterion.get(name, 1.0))
    return weights

  @staticmethod
  def _device_put(batch):
    return jax.tree_util.tree_map(jax.numpy.asarray, batch)
