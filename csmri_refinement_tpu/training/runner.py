"""Standard runner: single-model training as one jitted update step.

Rebuild of /root/reference/training/runner.py:18-216. The eager
forward → per-criterion losses → weighted sum → backward → step sequence
(runner.py:154-178) becomes a single compiled XLA program
``(state, batch, rng) → (state, losses, out)`` with `jax.value_and_grad`;
model/optimizer state is a pytree, never mutated in place.
"""

import functools
import logging

import jax
import jax.numpy as jnp
import optax
from flax import serialization
from flax.core import unfreeze

from csmri_refinement_tpu.data.transform_wrappers import (
    get_input_batch_transform, get_output_transform)
from csmri_refinement_tpu.metrics import get_loss_metric, get_metric_fn
from csmri_refinement_tpu.models import construct_model, get_input_keys
from csmri_refinement_tpu.utils.compile_opts import serving_jit
from csmri_refinement_tpu.training.base_runner import (BaseRunner,
                                                       cast_outputs_f32)
from csmri_refinement_tpu.training.lr_schedulers import get_lr_scheduler
from csmri_refinement_tpu.training.optimizers import (get_optimizer,
                                                      set_learning_rate)
from csmri_refinement_tpu.training.prep import get_batch_preparer
from csmri_refinement_tpu.training.model_setup import (
    apply_pretrained_weights)
from csmri_refinement_tpu.models.criteria import get_criterion
from csmri_refinement_tpu.parallel import mesh_from_conf, replicate, \
    shard_batch, shard_stacked_batch
from csmri_refinement_tpu.utils.config import Configuration


def build_runner(conf, mode='train'):
  """Construct the standard runner from config (reference runner.py:18-76)."""
  return Runner(conf, mode)


class Runner(BaseRunner):
  """Single input/output network with weighted multi-criterion loss."""

  def __init__(self, conf, mode='train'):
    super().__init__(conf, mode)
    model_conf = Configuration.from_dict(conf.model, conf)
    # Thread the run's undersampling section into the model conf: RecNet
    # derives the exact skinny-DC lowering from it (models/recnet.py).
    if conf.has_attr('undersampling') and \
        not model_conf.has_attr('undersampling'):
      model_conf.undersampling = conf.undersampling
    # Mixed-precision training: `train_dtype` (e.g. "bfloat16") sets the
    # model's COMPUTE dtype; params/optimizer state stay f32 (flax
    # param_dtype default), gradients come back f32 through the cast, and
    # the loss epilogue is pinned f32 (cast_outputs_f32). Train mode only —
    # evaluation of the same checkpoint runs at the model's own dtype.
    if mode == 'train' and conf.get_attr('train_dtype') and \
        not model_conf.has_attr('dtype'):
      model_conf.dtype = conf.train_dtype
    self.model_conf = model_conf
    self.model = construct_model(model_conf, model_conf.name)
    self.input_keys = get_input_keys(self.model)
    self.has_train_arg = getattr(self.model, 'HAS_TRAIN_ARG', False)

    self.val_metric_fns = {
        name: get_metric_fn(conf, name, 'test')
        for name in conf.get_attr('validation_metrics', default=[])}
    self.output_transform = get_output_transform(conf, conf.application,
                                                 'inference')
    # Input batch transforms are a no-op in all shipped applications;
    # hook retained for parity (reference transform_wrappers.py:107-124).
    get_input_batch_transform(conf, conf.application, 'test')

    self.preparer = get_batch_preparer(conf)
    self.mesh = mesh_from_conf(conf)
    self.rng = jax.random.PRNGKey(conf.seed)
    self.state = None  # lazy-initialized on first batch
    self._pending_restore = None
    # LR requested by epoch_beginning before lazy state init; applied in
    # _ensure_initialized so a resumed run's first epoch uses the scheduled
    # (decayed) LR rather than base_lr.
    self._scheduled_lr = None

    if mode == 'train':
      criteria = {}
      if conf.has_attr('loss_name'):
        criteria[conf.loss_name] = get_criterion(conf, conf.loss_name)
      else:
        for loss_name in conf.losses:
          criteria[loss_name] = get_criterion(conf, loss_name)
      assert len(criteria) > 0, \
          'Need at least one loss to optimize something!'
      self.criteria = criteria
      self.loss_weights = self._loss_weights(
          conf.get_attr('loss_weights', default={}), criteria)

      opt_conf = Configuration.from_dict(conf.optimizer, conf)
      self.tx, self.base_lr = get_optimizer(opt_conf, opt_conf.name)
      self.lr_scheduler = None
      if opt_conf.has_attr('lr_scheduler'):
        self.lr_scheduler = get_lr_scheduler(opt_conf, opt_conf.lr_scheduler)

      self.train_metric_fns = {
          name: get_metric_fn(conf, name, 'train')
          for name in conf.get_attr('train_metrics', default=[])}

      # Throughput mode: lax.scan k updates per host loss fetch. The
      # single-network step is even more dispatch/fetch-bound than the
      # GAN step this was built for (adversarial_runner, NOTES.md round
      # 3); per-step TB loss logging coarsens to every k steps, the
      # optimization trajectory is unchanged (equivalence-tested).
      self.steps_per_fetch = conf.get_attr('steps_per_fetch', default=1)
      # HBM mode: jax.checkpoint the model forward so the backward
      # recomputes activations instead of storing them (exact math; see
      # adversarial_runner.train_remat for the GAN-step rationale)
      self.train_remat = conf.get_attr('train_remat', default=False)
      self._scan_step_fn = None

      self._train_step_fn = self._make_train_step()
    else:
      self.criteria = {}
      self.train_metric_fns = {}
      self.tx = None
      self.lr_scheduler = None
      self.steps_per_fetch = 1
      self.train_remat = False

    self._val_step_fn = self._make_val_step()

  # -- initialization ---------------------------------------------------------

  def _model_inputs(self, batch):
    return [batch[k] for k in self.input_keys]

  def _ensure_initialized(self, batch):
    if self.state is not None:
      return
    self.rng, init_rng = jax.random.split(self.rng)
    # Init under jit: remote-compile TPU backends don't support the eager
    # dispatch a plain model.init would trigger (convs/FFTs per op).
    init_kwargs = {'train': False} if self.has_train_arg else {}
    init_fn = jax.jit(lambda rng, *inputs: self.model.init(
        {'params': rng, 'dropout': rng}, *inputs, **init_kwargs))
    variables = init_fn(init_rng, *self._model_inputs(batch))
    variables = unfreeze(variables)
    params = variables.pop('params')
    batch_stats = variables.pop('batch_stats', {})

    self.state = {
        'params': params,
        'batch_stats': batch_stats,
        'step': jnp.zeros((), jnp.int32),
    }
    if self.tx is not None:
      self.state['opt_state'] = self.tx.init(params)

    apply_pretrained_weights(self.state, self.model_conf, self.conf.file)
    if self.tx is not None:
      # Re-init optimizer state over the (possibly grafted) params
      self.state['opt_state'] = self.tx.init(self.state['params'])

    if self._pending_restore is not None:
      self._apply_restore(self._pending_restore)
      self._pending_restore = None

    # Apply any LR the scheduler requested before state existed (resume
    # path: epoch_beginning fires before the first batch initializes state).
    if self._scheduled_lr is not None and 'opt_state' in self.state:
      set_learning_rate(self.state['opt_state'], self._scheduled_lr)

    # Replicate model/optimizer state across the mesh; GSPMD inserts the
    # gradient all-reduce once batches are data-sharded.
    self.state = replicate(self.state, self.mesh)

  # -- jitted steps -----------------------------------------------------------

  def _apply_model(self, params, batch_stats, batch, train, dropout_rng):
    variables = {'params': params}
    kwargs = {}
    if batch_stats:
      variables['batch_stats'] = batch_stats
    if self.has_train_arg:
      kwargs['train'] = train
    mutable = ['batch_stats'] if (batch_stats and train) else False
    rngs = {'dropout': dropout_rng} if dropout_rng is not None else None
    out = self.model.apply(variables, *self._model_inputs(batch),
                           mutable=mutable, rngs=rngs, **kwargs)
    if mutable:
      out, new_model_state = out
      return out, new_model_state.get('batch_stats', {})
    return out, batch_stats

  def _train_step_impl(self, state, batch, rng):
    """One update's math (traceable: used by both the per-step jit and the
    steps_per_fetch lax.scan)."""
    criteria = self.criteria
    weights = self.loss_weights

    def forward(params):
      return self._apply_model(params, state['batch_stats'], batch, True,
                               rng)
    if self.train_remat:
      forward = jax.checkpoint(forward)

    def loss_fn(params):
      out, new_bs = forward(params)
      out = cast_outputs_f32(out)  # f32 loss epilogue (no-op for f32)
      losses = {name: crit(out, batch) for name, crit in criteria.items()}
      total = sum(weights[name] * loss for name, loss in losses.items())
      return total, (losses, out, new_bs)

    (total, (losses, out, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state['params'])
    updates, opt_state = self.tx.update(grads, state['opt_state'],
                                        state['params'])
    params = optax.apply_updates(state['params'], updates)
    new_state = {
        'params': params,
        'batch_stats': new_bs,
        'opt_state': opt_state,
        'step': state['step'] + 1,
    }
    losses = dict(losses)
    losses['loss'] = total
    return new_state, losses, out

  def _make_train_step(self):
    # donate_argnums=0: the previous step's state buffers are reused for
    # the new state in place (params/opt-state never double-buffer in HBM)
    from csmri_refinement_tpu.utils.compile_opts import training_jit

    @functools.partial(training_jit, donate_argnums=0)
    def step(state, batch, rng):
      return self._train_step_impl(state, batch, rng)

    return step

  def _get_scan_fn(self):
    """k updates in ONE compiled lax.scan, losses averaged on device — one
    host fetch per k steps instead of per step (see adversarial_runner
    _get_scan_fn; same design, single-network state)."""
    if self._scan_step_fn is None:
      def scan_steps(state, batches, rngs):
        def body(st, xs):
          host_b, rng_pair = xs
          batch = self.preparer.prepare_train(rng_pair[0], host_b)
          st, losses, _ = self._train_step_impl(st, batch, rng_pair[1])
          return st, losses
        state, losses = jax.lax.scan(body, state, (batches, rngs))
        mean_losses = {name: jnp.mean(vals) for name, vals in losses.items()}
        return state, mean_losses

      from csmri_refinement_tpu.utils.compile_opts import training_jit
      self._scan_step_fn = training_jit(scan_steps, donate_argnums=0)
    return self._scan_step_fn

  def _run_scanned_updates(self, host_batches):
    """Run len(host_batches) updates per host fetch (steps_per_fetch
    throughput mode). Returns averaged loss metrics; per-step train
    metrics/TB images are skipped by design."""
    import numpy as np
    k = len(host_batches)
    # identical key stream to k calls of the per-step path — including the
    # lazy init's own split after the first step's keys — so the scanned
    # trajectory is bit-equal to the per-step one (tested)
    self.rng, prep_rng, step_rng = jax.random.split(self.rng, 3)
    self._ensure_initialized(
        self.preparer.prepare_train(prep_rng, host_batches[0]))
    pairs = [jnp.stack([prep_rng, step_rng])]
    for _ in range(k - 1):
      self.rng, prep_rng, step_rng = jax.random.split(self.rng, 3)
      pairs.append(jnp.stack([prep_rng, step_rng]))
    rngs = jnp.stack(pairs)
    stacked = {key: np.stack([np.asarray(hb[key]) for hb in host_batches])
               for key in host_batches[0]}
    stacked = shard_stacked_batch(stacked, self.mesh)

    scan_fn = self._get_scan_fn()
    self.state, losses = scan_fn(self.state, stacked, rngs)
    # Same metric names as the per-step path: criterion losses carry the
    # 'loss_' prefix, the weighted total stays 'loss' (TB log continuity).
    return {('loss' if name == 'loss' else 'loss_' + name):
            get_loss_metric(self._scalar(value))
            for name, value in losses.items()}

  def _make_val_step(self):
    criteria = self.criteria

    @serving_jit
    def step(state, batch):
      # Evaluation fidelity: TPU's default matmul/conv precision is a
      # single bf16 pass even for f32 models — measured up to 0.065 SSIM
      # error, batch-shape dependent (NOTES.md round 2). 'high' (bf16x3)
      # restores f32-grade eval; for bf16 models it changes nothing.
      with jax.default_matmul_precision('high'):
        out, _ = self._apply_model(state['params'], state['batch_stats'],
                                   batch, False, None)
        out = cast_outputs_f32(out)  # f32 loss/metric epilogue (no-op f32)
        losses = {name: crit(out, batch) for name, crit in criteria.items()}
      return out, losses

    return step

  # -- BaseRunner hooks ---------------------------------------------------------

  def _train_step(self, batch_iter):
    if (self.steps_per_fetch > 1
        and getattr(self.preparer, 'device_pure', False)):
      host_batches = self._collect_stackable_batches(batch_iter,
                                                     self.steps_per_fetch)
      if not host_batches:
        return 0, None, None
      loss_metrics = self._run_scanned_updates(host_batches)
      return len(host_batches), loss_metrics, None

    host_batch = next(batch_iter, None)
    if host_batch is None:
      return 0, None, None
    host_batch = self._preshard_host_batch(host_batch)
    self.rng, prep_rng, step_rng = jax.random.split(self.rng, 3)
    batch = self.preparer.prepare_train(prep_rng, host_batch)
    self._ensure_initialized(batch)
    batch = shard_batch(batch, self.mesh)

    self.state, losses, out = self._train_step_fn(self.state, batch,
                                                  step_rng)
    loss_metrics = {'loss_' + name: get_loss_metric(self._scalar(value))
                    for name, value in losses.items() if name != 'loss'}
    loss_metrics['loss'] = get_loss_metric(self._scalar(losses['loss']))
    return 1, loss_metrics, (batch, out)

  def _val_step(self, host_batch, compute_metrics=True):
    host_batch = self._preshard_host_batch(host_batch)
    batch = self.preparer.prepare_val(host_batch)
    self._ensure_initialized(batch)
    batch = shard_batch(batch, self.mesh)

    out, losses = self._val_step_fn(self.state, batch)
    # Multi-process: metric/image host fetches need fully-replicated
    # leaves (a data-sharded global array is not addressable from one
    # process) — no-op otherwise.
    from csmri_refinement_tpu.parallel import gather_to_replicated
    batch, out = gather_to_replicated((batch, out), self.mesh)
    loss_metrics = {}
    if compute_metrics:
      loss_metrics = {'loss_' + name: get_loss_metric(self._scalar(value))
                      for name, value in losses.items()}
    return loss_metrics, (batch, out)

  def _compute_metrics(self, metric_fns, prediction, target):
    return {name: fn(prediction, target)
            for name, fn in metric_fns.items()}

  def _compute_train_metrics(self, data):
    if data is None:   # scanned throughput mode skips per-step train metrics
      return {}
    batch, out = data
    return self._compute_metrics(self.train_metric_fns, out, batch)

  def _compute_test_metrics(self, data):
    batch, out = data
    return self._compute_metrics(self.val_metric_fns, out, batch)

  def predict(self, batch):
    batch = self._device_put(batch)
    self._ensure_initialized(batch)
    if not hasattr(self, '_predict_fn'):
      def _predict(state, b):
        with jax.default_matmul_precision('high'):  # see _make_val_step
          return self._apply_model(state['params'], state['batch_stats'],
                                   b, False, None)[0]
      self._predict_fn = serving_jit(_predict)
    return self._predict_fn(self.state, batch)

  def export_predict_parts(self):
    """(pure predict fn, its state, model input keys) for the jax.export
    serving artifact (:mod:`csmri_refinement_tpu.utils.export`)."""
    def fn(state, b):
      with jax.default_matmul_precision('high'):  # see _make_val_step
        return self._apply_model(state['params'], state['batch_stats'],
                                 b, False, None)[0]
    return fn, self.state, list(self.input_keys)

  # -- bookkeeping ---------------------------------------------------------------

  def epoch_beginning(self, epoch):
    if self.lr_scheduler is not None:
      self._scheduled_lr = self.lr_scheduler(epoch - 1)
      logging.info('Epoch %d learning rate: %g', epoch, self._scheduled_lr)
      if self.state is not None and 'opt_state' in self.state:
        set_learning_rate(self.state['opt_state'], self._scheduled_lr)

  def epoch_finished(self, epoch):
    pass

  def get_named_outputs(self, data):
    batch, out_model = data
    prediction = out_model['pred'] if isinstance(out_model, dict) \
        else out_model
    target = batch['target']
    if self.output_transform is not None:
      prediction, target = self.output_transform(prediction, target)
    return {
        'input': batch['inp'],
        'prediction': prediction,
        'target': target,
    }

  def get_named_models(self):
    return {'model': self.model}

  def state_dict(self):
    assert self.state is not None, 'Runner state not initialized'
    out = {
        'model': {
            'params': serialization.to_state_dict(self.state['params']),
            'batch_stats': serialization.to_state_dict(
                self.state['batch_stats']),
        },
        'step': int(self.state['step']),
    }
    if 'opt_state' in self.state:
      out['optimizer'] = serialization.to_state_dict(
          self.state['opt_state'])
    return out

  def load_state_dict(self, state_dict):
    if self.state is None:
      self._pending_restore = state_dict
      return
    self._apply_restore(state_dict)

  def _apply_restore(self, state_dict):
    self.state['params'] = serialization.from_state_dict(
        self.state['params'], state_dict['model']['params'])
    self.state['batch_stats'] = serialization.from_state_dict(
        self.state['batch_stats'],
        state_dict['model'].get('batch_stats', {}))
    if 'step' in state_dict:
      self.state['step'] = jnp.asarray(state_dict['step'], jnp.int32)
    if 'optimizer' in state_dict and 'opt_state' in self.state:
      self.state['opt_state'] = serialization.from_state_dict(
          self.state['opt_state'], state_dict['optimizer'])
    logging.debug('Restored runner state')

  def __str__(self):
    return 'Model:\n{}'.format(self.model)
