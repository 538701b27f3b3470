"""Adversarial runner: the GAN training engine as compiled XLA steps.

Rebuild of /root/reference/training/adversarial_runner.py:22-607. The
reference's eager five-pass step (generator forward; discriminator on
pool-mixed detached fakes; discriminator on reals; discriminator on
non-detached fakes for generator gradients; VGG passes inside criteria) with
D-then-G optimizer updates becomes ONE jitted program per flag combination:

* detach semantics → explicit ``stop_gradient`` (the generator output is
  recomputed inside the generator loss with the same dropout keys, so both
  phases see the identical sample while gradients flow only where the
  reference lets them)
* both updates use pre-step weights of the other network, matching the
  reference order (losses all computed before either optimizer.step,
  adversarial_runner.py:322-389)
* discriminator BatchNorm running stats accumulate over the three passes in
  reference order (fake-pool → real → fake-gen)
* the image pool is an on-device ring buffer threaded through the step
* generator/discriminator pretraining schedules
  (adversarial_runner.py:195-209, 267-299) and ``updates_per_step``
  multi-update training (adversarial_runner.py:391-525) select among
  compiled step variants keyed by (update_gen, update_disc, use_disc)

Validation (adversarial_runner.py:527-557): generator in eval mode, the
discriminator runs on fakes and reals with the no-pool input fn, and only
the plain generator criteria are reported.
"""

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
from csmri_refinement_tpu.models.criteria import get_criterion
from csmri_refinement_tpu.training import image_pool
from csmri_refinement_tpu.utils.compile_opts import serving_jit
from csmri_refinement_tpu.training.adversarial_training import (
    get_discriminator_input_fn)
from csmri_refinement_tpu.training.base_runner import (BaseRunner,
                                                       cast_outputs_f32)
from csmri_refinement_tpu.training.lr_schedulers import get_lr_scheduler
from csmri_refinement_tpu.training.model_setup import (
    apply_pretrained_weights)
from csmri_refinement_tpu.training.optimizers import (get_optimizer,
                                                      set_learning_rate)
from csmri_refinement_tpu.training.prep import get_batch_preparer
from csmri_refinement_tpu.parallel import mesh_from_conf, replicate, \
    shard_batch, shard_stacked_batch
from csmri_refinement_tpu.utils.config import Configuration


def build_runner(conf, mode='train'):
  return AdversarialRunner(conf, mode)


def _get_pretraining_schedule(epochs):
  """(start, end) epoch interval (adversarial_runner.py:199-209)."""
  if epochs is None:
    return (-1, -1)
  if isinstance(epochs, int):
    return (1, epochs + 1)
  assert epochs[0] < epochs[1], \
      'Starting epoch must be smaller than ending epoch'
  return tuple(epochs)


class AdversarialRunner(BaseRunner):
  """Generator + discriminator trained by a single compiled update step."""

  def __init__(self, conf, mode='train'):
    super().__init__(conf, mode)
    self.gen_model_conf = Configuration.from_dict(conf.generator_model, conf)
    # Thread the run's undersampling section into the generator conf:
    # RecNet derives the exact skinny-DC lowering from it (models/recnet.py).
    if conf.has_attr('undersampling') and \
        not self.gen_model_conf.has_attr('undersampling'):
      self.gen_model_conf.undersampling = conf.undersampling
    # Mixed-precision training (`train_dtype`, see runner.py): compute
    # dtype for every network of the GAN step; params/opt state stay f32,
    # loss epilogues pinned f32 via cast_outputs_f32. Train mode only.
    if mode == 'train' and conf.get_attr('train_dtype') and \
        not self.gen_model_conf.has_attr('dtype'):
      self.gen_model_conf.dtype = conf.train_dtype
    self.gen = construct_model(self.gen_model_conf, self.gen_model_conf.name)
    self.gen_input_keys = get_input_keys(self.gen)
    self.gen_has_train_arg = getattr(self.gen, 'HAS_TRAIN_ARG', False)

    self.val_metric_fns = {
        name: get_metric_fn(conf, name, 'test')
        for name in conf.get_attr('validation_metrics', default=[])}
    self.output_transform = get_output_transform(conf, conf.application,
                                                 'inference')
    get_input_batch_transform(conf, conf.application, 'test')

    self.preparer = get_batch_preparer(conf)
    self.mesh = mesh_from_conf(conf)
    self.rng = jax.random.PRNGKey(conf.seed)
    self.gen_state = None
    self.disc_state = None
    self.pool_state = None
    self._pending_restore = None
    self._step_cache = {}
    # LRs requested by epoch_beginning before lazy state init (resume path)
    self._scheduled_gen_lr = None
    self._scheduled_disc_lr = None

    self.generator_enabled = True
    self.discriminator_enabled = True

    if mode == 'train':
      self.disc_model_conf = Configuration.from_dict(
          conf.discriminator_model, conf)
      if conf.get_attr('train_dtype') and \
          not self.disc_model_conf.has_attr('dtype'):
        self.disc_model_conf.dtype = conf.train_dtype
      self.disc = construct_model(self.disc_model_conf, 'CNNDiscriminator')

      self.gen_adv_criteria = {
          name: get_criterion(conf, name, loss_type='gen')
          for name in conf.generator_adversarial_losses}
      self.gen_criteria = {
          name: get_criterion(conf, name)
          for name in conf.generator_losses}
      self.disc_adv_criteria = {
          name: get_criterion(conf, name, loss_type='disc')
          for name in conf.discriminator_losses}

      self.gen_loss_weights = self._loss_weights(
          conf.get_attr('generator_loss_weights', default={}),
          self.gen_adv_criteria, self.gen_criteria)
      self.disc_loss_weights = self._loss_weights(
          conf.get_attr('discriminator_loss_weights', default={}),
          self.disc_adv_criteria)

      gen_opt_conf = Configuration.from_dict(conf.generator_optimizer, conf)
      self.gen_tx, _ = get_optimizer(gen_opt_conf, gen_opt_conf.name)
      self.gen_lr_scheduler = None
      if gen_opt_conf.has_attr('lr_scheduler'):
        self.gen_lr_scheduler = get_lr_scheduler(gen_opt_conf,
                                                 gen_opt_conf.lr_scheduler)

      disc_opt_conf = Configuration.from_dict(conf.discriminator_optimizer,
                                              conf)
      self.disc_tx, _ = get_optimizer(disc_opt_conf, disc_opt_conf.name)
      self.disc_lr_scheduler = None
      if disc_opt_conf.has_attr('lr_scheduler'):
        self.disc_lr_scheduler = get_lr_scheduler(
            disc_opt_conf, disc_opt_conf.lr_scheduler)

      self.gen_updates_per_step = gen_opt_conf.get_attr('updates_per_step',
                                                        default=1)
      self.disc_updates_per_step = disc_opt_conf.get_attr(
          'updates_per_step', default=1)
      # Throughput mode: lax.scan k D-then-G updates per host loss fetch
      # (the per-step fetch is dispatch-bound at the paper's batch 5 —
      # NOTES.md round 3). Per-step TB loss logging coarsens to every k
      # steps; optimization trajectory is unchanged.
      self.steps_per_fetch = conf.get_attr('steps_per_fetch', default=1)
      # HBM mode: jax.checkpoint the gen/disc (and VGG, criteria.py)
      # forwards so the backward recomputes activations instead of storing
      # them — trades ~1 extra forward of FLOPs for the activation HBM of
      # the 5-network step (the un-remat'd step RESOURCE_EXHAUSTs at batch
      # 64 @256² on a v5e — NOTES.md rounds 3-4). Exact: same math, same
      # trajectory (equivalence-tested).
      self.train_remat = conf.get_attr('train_remat', default=False)

      self.train_gen_metric_fns = {
          name: get_metric_fn(conf, name, 'train')
          for name in conf.get_attr('train_generator_metrics', default=[])}
      self.train_disc_metric_fns = {
          name: get_metric_fn(conf, name, 'train')
          for name in conf.get_attr('train_discriminator_metrics',
                                    default=[])}
      self.val_disc_metric_fns = {
          name: get_metric_fn(conf, name, 'test')
          for name in conf.get_attr('validation_discriminator_metrics',
                                    default=[])}

      self.disc_input_fn = get_discriminator_input_fn(conf,
                                                      self.disc_model_conf)
      self.val_disc_input_fn = get_discriminator_input_fn(
          conf, self.disc_model_conf, no_pool=True)
      self.pool_size = image_pool.pool_size_from_conf(conf,
                                                      self.disc_model_conf)

      self.generator_pretraining_schedule = _get_pretraining_schedule(
          conf.get_attr('pretrain_generator_epochs'))
      self.discriminator_pretraining_schedule = _get_pretraining_schedule(
          conf.get_attr('pretrain_discriminator_epochs'))
    else:
      self.disc = None
      self.gen_criteria = {}
      self.gen_tx = None
      self.disc_tx = None
      self.gen_lr_scheduler = None
      self.disc_lr_scheduler = None
      self.gen_updates_per_step = 1
      self.disc_updates_per_step = 1
      self.steps_per_fetch = 1
      self.train_remat = False
      self.train_gen_metric_fns = {}
      self.train_disc_metric_fns = {}
      self.val_disc_metric_fns = {}
      self.val_disc_input_fn = None
      self.pool_size = None

    def _val_step_hp(gen_state, disc_state, batch):
      # eval fidelity: see runner._make_val_step (bf16x3 for f32 models)
      with jax.default_matmul_precision('high'):
        return self._val_step_impl(gen_state, disc_state, batch)
    self._val_step_fn = serving_jit(_val_step_hp)

  # -- model application helpers ------------------------------------------------

  def _apply_net(self, model, params, batch_stats, inputs, train,
                 dropout_rng, has_train_arg=True):
    variables = {'params': params}
    if batch_stats:
      variables['batch_stats'] = batch_stats
    kwargs = {'train': train} if has_train_arg else {}
    mutable = ['batch_stats'] if (batch_stats and train) else False
    rngs = {'dropout': dropout_rng} if dropout_rng is not None else None
    out = model.apply(variables, *inputs, mutable=mutable, rngs=rngs,
                      **kwargs)
    if mutable:
      out, new_state = out
      return out, unfreeze(new_state).get('batch_stats', {})
    return out, batch_stats

  def _gen_inputs(self, batch):
    return [batch[k] for k in self.gen_input_keys]

  # -- initialization -------------------------------------------------------------

  def _ensure_initialized(self, batch):
    if self.gen_state is not None:
      return
    self.rng, gen_rng, disc_rng = jax.random.split(self.rng, 3)

    # All init/forward work below runs under jit: remote-compile TPU
    # backends don't support eager op dispatch.
    gen_kwargs = {'train': False} if self.gen_has_train_arg else {}
    gen_init = jax.jit(lambda rng, *inputs: self.gen.init(
        {'params': rng, 'dropout': rng}, *inputs, **gen_kwargs))
    variables = unfreeze(gen_init(gen_rng, *self._gen_inputs(batch)))
    self.gen_state = {
        'params': variables.pop('params'),
        'batch_stats': variables.pop('batch_stats', {}),
        'step': jnp.zeros((), jnp.int32),
    }
    apply_pretrained_weights(self.gen_state, self.gen_model_conf,
                             self.conf.file)
    if self.gen_tx is not None:
      self.gen_state['opt_state'] = self.gen_tx.init(
          self.gen_state['params'])

    if self.disc is not None:
      # Build a representative discriminator input from the generator output
      def make_disc_in(state, b):
        out_gen, _ = self._apply_net(
            self.gen, state['params'], state['batch_stats'],
            self._gen_inputs(b), False, None, self.gen_has_train_arg)
        return self.disc_input_fn._build(out_gen, b['inp'], out_gen)

      disc_in = jax.jit(make_disc_in)(self.gen_state, batch)
      disc_init = jax.jit(lambda rng, x: self.disc.init(
          {'params': rng, 'dropout': rng}, x, train=False))
      dvars = unfreeze(disc_init(disc_rng, disc_in))
      self.disc_state = {
          'params': dvars.pop('params'),
          'batch_stats': dvars.pop('batch_stats', {}),
          'step': jnp.zeros((), jnp.int32),
      }
      apply_pretrained_weights(self.disc_state, self.disc_model_conf,
                               self.conf.file)
      if self.disc_tx is not None:
        self.disc_state['opt_state'] = self.disc_tx.init(
            self.disc_state['params'])

      if self.pool_size:
        self.pool_state = image_pool.init_pool(self.pool_size,
                                               disc_in.shape[1:])

    if self._pending_restore is not None:
      self._apply_restore(self._pending_restore)
      self._pending_restore = None

    # Apply LRs the schedulers requested before state existed (resume path)
    if self._scheduled_gen_lr is not None and 'opt_state' in self.gen_state:
      set_learning_rate(self.gen_state['opt_state'], self._scheduled_gen_lr)
    if (self._scheduled_disc_lr is not None and self.disc_state is not None
        and 'opt_state' in self.disc_state):
      set_learning_rate(self.disc_state['opt_state'],
                        self._scheduled_disc_lr)

    self.gen_state = replicate(self.gen_state, self.mesh)
    if self.disc_state is not None:
      self.disc_state = replicate(self.disc_state, self.mesh)
    if self.pool_state is not None:
      # Pool history is replicated: every device sees the same pool and the
      # same swap decisions (keys are replicated too)
      self.pool_state = replicate(self.pool_state, self.mesh)

  # -- jitted train step ----------------------------------------------------------

  def _get_step_fn(self, update_gen, update_disc, use_disc):
    key = (update_gen, update_disc, use_disc)
    if key not in self._step_cache:
      # donate gen/disc/pool state buffers: each step reuses them in place
      from csmri_refinement_tpu.utils.compile_opts import training_jit
      self._step_cache[key] = training_jit(
          lambda gen_state, disc_state, pool_state, batch, rng:
          self._train_step_impl(gen_state, disc_state, pool_state, batch,
                                rng, update_gen, update_disc, use_disc),
          donate_argnums=(0, 1, 2))
    return self._step_cache[key]

  def _train_step_impl(self, gen_state, disc_state, pool_state, batch, rng,
                       update_gen, update_disc, use_disc):
    (gen_dropout_rng, disc_rng1, disc_rng2, disc_rng3,
     pool_rng) = jax.random.split(rng, 5)
    gen_inputs = self._gen_inputs(batch)
    losses_out = {}

    def gen_forward(params):
      # cast_outputs_f32: f32 loss epilogue for mixed-precision training
      # (train_dtype) — gen outputs feed criteria, the pool, and the disc;
      # no-op for f32 models
      out, bs = self._apply_net(self.gen, params, gen_state['batch_stats'],
                                gen_inputs, True, gen_dropout_rng,
                                self.gen_has_train_arg)
      return cast_outputs_f32(out), bs

    def disc_apply(params, bs, x, dropout_rng):
      out, new_bs = self._apply_net(self.disc, params, bs, [x], True,
                                    dropout_rng)
      return cast_outputs_f32(out), new_bs

    if self.train_remat:
      # Recompute-in-backward (see __init__): both closures take only
      # array pytrees, so jax.checkpoint wraps them directly
      gen_forward = jax.checkpoint(gen_forward)
      disc_apply = jax.checkpoint(disc_apply)

    # Detached generator output for the discriminator phase
    out_gen_d = jax.lax.stop_gradient(gen_forward(gen_state['params'])[0])

    new_pool = pool_state
    out_disc_fake = out_disc_real = None
    disc_bs_after = disc_state['batch_stats'] if disc_state else {}
    d_grads = None

    # The discriminator phase (pool-mixed detached fakes + reals + D losses)
    # only runs when D is being updated. The reference's gen-only multi-step
    # phase skips it too (adversarial_runner.py:470-525) and computes the
    # detached real pass inside the generator phase only when feature
    # matching needs it.
    run_disc_phase = use_disc and update_disc

    if run_disc_phase:
      def disc_loss_fn(disc_params):
        fake_in, pool_after = self.disc_input_fn(
            out_gen_d, gen_inputs[0], out_gen_d, is_real_input=False,
            detach=True, pool_state=pool_state, key=pool_rng)
        out_fake, bs1 = disc_apply(disc_params,
                                   disc_state['batch_stats'], fake_in,
                                   disc_rng1)
        real_in, _ = self.disc_input_fn(
            batch['target'], gen_inputs[0], out_gen_d, is_real_input=True,
            detach=True)
        out_real, bs2 = disc_apply(disc_params, bs1, real_in, disc_rng2)
        dlosses = {name: crit(out_fake, out_real)
                   for name, crit in self.disc_adv_criteria.items()}
        total = sum(self.disc_loss_weights[name] * loss
                    for name, loss in dlosses.items())
        return total, (dlosses, out_fake, out_real, bs2, pool_after)

      (d_total, d_aux), d_grads = jax.value_and_grad(
          disc_loss_fn, has_aux=True)(disc_state['params'])
      dlosses, out_disc_fake, out_disc_real, disc_bs_after, new_pool = d_aux
      for name, loss in dlosses.items():
        losses_out['disc_loss_' + name] = loss
      losses_out['disc_loss'] = d_total

    new_gen_state = gen_state
    out_gen = out_gen_d
    if update_gen:
      # Whether the generator phase needs a detached real pass (feature
      # matching compares against real features; reference
      # adversarial_runner.py:476-488)
      from csmri_refinement_tpu.models.adversarial_loss import (
          FeatureMatchingLoss)
      needs_real = any(isinstance(c, FeatureMatchingLoss)
                       for c in self.gen_adv_criteria.values()) and \
          out_disc_real is None

      def gen_loss_fn(gen_params):
        out_gen_g, gen_bs = gen_forward(gen_params)
        glosses = {}
        disc_bs3 = disc_bs_after
        out_fake2 = None
        out_real_g = out_disc_real
        if use_disc:
          # Non-detached pass: gradients flow generator → disc input;
          # disc params are constants here (updated separately)
          fake_in2, _ = self.disc_input_fn(
              out_gen_g, gen_inputs[0], out_gen_g, is_real_input=False,
              detach=False)
          out_fake2, disc_bs3 = disc_apply(disc_state['params'],
                                           disc_bs_after, fake_in2,
                                           disc_rng3)
          if needs_real:
            real_in, _ = self.disc_input_fn(
                batch['target'], gen_inputs[0], out_gen_g,
                is_real_input=True, detach=True)
            out_real_g, disc_bs3 = disc_apply(disc_state['params'],
                                              disc_bs3, real_in, disc_rng2)
          for name, crit in self.gen_adv_criteria.items():
            glosses[name] = crit(out_fake2, out_real_g)
        for name, crit in self.gen_criteria.items():
          glosses[name] = crit(out_gen_g, batch)
        total = sum(self.gen_loss_weights[name] * loss
                    for name, loss in glosses.items())
        return total, (glosses, out_gen_g, gen_bs, out_fake2, out_real_g,
                       disc_bs3)

      (g_total, g_aux), g_grads = jax.value_and_grad(
          gen_loss_fn, has_aux=True)(gen_state['params'])
      glosses, out_gen, gen_bs, out_fake2, out_disc_real, disc_bs_after = \
          g_aux
      for name, loss in glosses.items():
        losses_out['gen_loss_' + name] = loss
      losses_out['gen_loss'] = g_total
      if out_fake2 is not None:
        out_disc_fake = out_fake2

      updates, gen_opt_state = self.gen_tx.update(
          g_grads, gen_state['opt_state'], gen_state['params'])
      new_gen_state = {
          'params': optax.apply_updates(gen_state['params'], updates),
          'batch_stats': gen_bs,
          'opt_state': gen_opt_state,
          'step': gen_state['step'] + 1,
      }

    new_disc_state = disc_state
    if use_disc:
      new_disc_state = dict(disc_state)
      new_disc_state['batch_stats'] = disc_bs_after
      if update_disc:
        updates, disc_opt_state = self.disc_tx.update(
            d_grads, disc_state['opt_state'], disc_state['params'])
        new_disc_state['params'] = optax.apply_updates(
            disc_state['params'], updates)
        new_disc_state['opt_state'] = disc_opt_state
        new_disc_state['step'] = disc_state['step'] + 1

    data = (out_gen, out_disc_fake, out_disc_real)
    return new_gen_state, new_disc_state, new_pool, losses_out, data

  # -- BaseRunner hooks --------------------------------------------------------------

  def _get_scan_fn(self, k, use_disc):
    """k D-then-G updates in ONE compiled lax.scan, losses averaged on
    device — one host fetch per k steps instead of per step."""
    key = ('scan', k, use_disc)
    if key not in self._step_cache:
      def scan_steps(gen_state, disc_state, pool_state, batches, rngs):
        def body(carry, xs):
          gen_s, disc_s, pool_s = carry
          host_b, rng_pair = xs
          batch = self.preparer.prepare_train(rng_pair[0], host_b)
          gen_s, disc_s, pool_s, losses, _ = self._train_step_impl(
              gen_s, disc_s, pool_s, batch, rng_pair[1], True, True,
              use_disc)
          return (gen_s, disc_s, pool_s), losses
        (gen_state, disc_state, pool_state), losses = jax.lax.scan(
            body, (gen_state, disc_state, pool_state), (batches, rngs))
        mean_losses = {name: jnp.mean(vals) for name, vals in losses.items()}
        return gen_state, disc_state, pool_state, mean_losses

      from csmri_refinement_tpu.utils.compile_opts import training_jit
      self._step_cache[key] = training_jit(scan_steps,
                                           donate_argnums=(0, 1, 2))
    return self._step_cache[key]

  def _run_scanned_updates(self, host_batches):
    """Run len(host_batches) full updates per host fetch (steps_per_fetch
    throughput mode). Returns averaged loss metrics; per-step train
    metrics/TB images are skipped by design."""
    import numpy as np
    k = len(host_batches)
    # identical key stream to k calls of _run_one_update — including the
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

    scan_fn = self._get_scan_fn(k, self.discriminator_enabled)
    (self.gen_state, self.disc_state, self.pool_state,
     losses) = scan_fn(self.gen_state, self.disc_state, self.pool_state,
                       stacked, rngs)
    loss_metrics = {name: get_loss_metric(self._scalar(value))
                    for name, value in losses.items()}
    return loss_metrics

  def _run_one_update(self, host_batch, update_gen, update_disc):
    host_batch = self._preshard_host_batch(host_batch)
    self.rng, prep_rng, step_rng = jax.random.split(self.rng, 3)
    batch = self.preparer.prepare_train(prep_rng, host_batch)
    self._ensure_initialized(batch)
    batch = shard_batch(batch, self.mesh)

    use_disc = self.discriminator_enabled
    step_fn = self._get_step_fn(update_gen and self.generator_enabled,
                                update_disc and use_disc, use_disc)
    (self.gen_state, self.disc_state, self.pool_state, losses,
     data) = step_fn(self.gen_state, self.disc_state, self.pool_state,
                     batch, step_rng)
    loss_metrics = {name: get_loss_metric(self._scalar(value))
                    for name, value in losses.items()}
    return loss_metrics, (batch,) + data

  def _train_step(self, batch_iter):
    if self.gen_updates_per_step == 1 and self.disc_updates_per_step == 1:
      if (self.steps_per_fetch > 1 and self.generator_enabled
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
      loss_metrics, data = self._run_one_update(host_batch, True, True)
      return 1, loss_metrics, data

    # Multi-update variant (adversarial_runner.py:391-525): dequeue
    # max(gen, disc) batches, D updates first, then G updates.
    max_updates = max(self.disc_updates_per_step, self.gen_updates_per_step)
    batches = []
    for _ in range(max_updates):
      host_batch = next(batch_iter, None)
      if host_batch is None:
        break
      batches.append(host_batch)
    if not batches:
      return 0, None, None

    from csmri_refinement_tpu.metrics import accumulate_metric
    loss_metrics = {}
    data = None
    for host_batch in batches[:self.disc_updates_per_step]:
      if not self.discriminator_enabled:
        continue
      metrics, data = self._run_one_update(host_batch, False, True)
      for name, metric in metrics.items():
        accumulate_metric(loss_metrics, name, metric)
    for host_batch in batches[:self.gen_updates_per_step]:
      if not self.generator_enabled:
        continue
      metrics, data = self._run_one_update(host_batch, True, False)
      for name, metric in metrics.items():
        accumulate_metric(loss_metrics, name, metric)

    avg = {name: metric.average() for name, metric in loss_metrics.items()}
    return len(batches), avg, data

  # -- validation ----------------------------------------------------------------------

  def _val_step_impl(self, gen_state, disc_state, batch):
    out_gen, _ = self._apply_net(self.gen, gen_state['params'],
                                 gen_state['batch_stats'],
                                 self._gen_inputs(batch), False, None,
                                 self.gen_has_train_arg)
    out_disc_fake = out_disc_real = None
    if self.disc is not None and disc_state is not None:
      fake_in, _ = self.val_disc_input_fn(
          out_gen, batch['inp'], out_gen, is_real_input=False, detach=True)
      out_disc_fake, _ = self._apply_net(self.disc, disc_state['params'],
                                         disc_state['batch_stats'],
                                         [fake_in], False, None)
      real_in, _ = self.val_disc_input_fn(
          batch['target'], batch['inp'], out_gen, is_real_input=True,
          detach=True)
      out_disc_real, _ = self._apply_net(self.disc, disc_state['params'],
                                         disc_state['batch_stats'],
                                         [real_in], False, None)
    # f32 loss/metric epilogue — disc outputs included: under
    # train_dtype=bfloat16 they are bf16 activations, and validation
    # host-fetches them for disc metrics/image summaries (bf16
    # device→host transfers are UNIMPLEMENTED on the tunneled TPU).
    out_gen = cast_outputs_f32(out_gen)
    out_disc_fake = cast_outputs_f32(out_disc_fake)
    out_disc_real = cast_outputs_f32(out_disc_real)
    losses = {name: crit(out_gen, batch)
              for name, crit in self.gen_criteria.items()}
    return out_gen, out_disc_fake, out_disc_real, losses

  def _val_step(self, host_batch, compute_metrics=True):
    host_batch = self._preshard_host_batch(host_batch)
    batch = self.preparer.prepare_val(host_batch)
    self._ensure_initialized(batch)
    batch = shard_batch(batch, self.mesh)
    out_gen, out_disc_fake, out_disc_real, losses = self._val_step_fn(
        self.gen_state, self.disc_state, batch)
    # Multi-process: host fetches (metrics/images) need fully-replicated
    # leaves — no-op otherwise.
    from csmri_refinement_tpu.parallel import gather_to_replicated
    batch, out_gen, out_disc_fake, out_disc_real = gather_to_replicated(
        (batch, out_gen, out_disc_fake, out_disc_real), self.mesh)
    loss_metrics = {}
    if compute_metrics:
      loss_metrics = {'gen_loss_' + name: get_loss_metric(
          self._scalar(value)) for name, value in losses.items()}
    return loss_metrics, (batch, out_gen, out_disc_fake, out_disc_real)

  # -- metrics -----------------------------------------------------------------------

  def _compute_gen_metrics(self, metrics, metric_fns, predictions, targets):
    for metric_name, metric_fn in metric_fns.items():
      metrics['gen_' + metric_name] = metric_fn(predictions, targets)
    return metrics

  def _compute_disc_metrics(self, metrics, metric_fns, out_disc_fake,
                            out_disc_real):
    prob_fake = out_disc_fake['prob']
    prob_real = out_disc_real['prob']
    for metric_name, metric_fn in metric_fns.items():
      metrics['disc_' + metric_name] = metric_fn(prob_fake, prob_real,
                                                 transform=False)
    return metrics

  def _compute_train_metrics(self, data):
    if data is None:   # scanned throughput mode skips per-step train metrics
      return {}
    batch, out_gen, out_disc_fake, out_disc_real = data
    metrics = {}
    self._compute_gen_metrics(metrics, self.train_gen_metric_fns, out_gen,
                              batch)
    if out_disc_fake is not None and out_disc_real is not None:
      self._compute_disc_metrics(metrics, self.train_disc_metric_fns,
                                 out_disc_fake, out_disc_real)
    return metrics

  def _compute_test_metrics(self, data):
    batch, out_gen, out_disc_fake, out_disc_real = data
    metrics = {}
    self._compute_gen_metrics(metrics, self.val_metric_fns, out_gen, batch)
    if out_disc_fake is not None and out_disc_real is not None:
      self._compute_disc_metrics(metrics, self.val_disc_metric_fns,
                                 out_disc_fake, out_disc_real)
    return metrics

  # -- epoch hooks ------------------------------------------------------------------------

  def epoch_beginning(self, epoch):
    if self.gen_lr_scheduler is not None:
      self._scheduled_gen_lr = self.gen_lr_scheduler(epoch - 1)
      logging.info('Epoch %d generator learning rate: %g', epoch,
                   self._scheduled_gen_lr)
      if self.gen_state is not None and 'opt_state' in self.gen_state:
        set_learning_rate(self.gen_state['opt_state'],
                          self._scheduled_gen_lr)
    if self.disc_lr_scheduler is not None:
      self._scheduled_disc_lr = self.disc_lr_scheduler(epoch - 1)
      logging.info('Epoch %d discriminator learning rate: %g', epoch,
                   self._scheduled_disc_lr)
      if self.disc_state is not None and 'opt_state' in self.disc_state:
        set_learning_rate(self.disc_state['opt_state'],
                          self._scheduled_disc_lr)

    start, end = self.generator_pretraining_schedule
    if start <= epoch < end:
      logging.debug('Pretraining generator, discriminator disabled')
      self.discriminator_enabled = False
      self.generator_enabled = True
    else:
      self.discriminator_enabled = True
    if start == epoch:
      logging.info('Start pretraining generator in epoch %s', epoch)
    elif end == epoch:
      logging.info('Stop pretraining generator before epoch %s', epoch)

    start, end = self.discriminator_pretraining_schedule
    if start <= epoch < end:
      logging.debug('Pretraining discriminator, generator disabled')
      self.discriminator_enabled = True
      self.generator_enabled = False
    else:
      self.generator_enabled = True
    if start == epoch:
      logging.info('Start pretraining discriminator in epoch %s', epoch)
    elif end == epoch:
      logging.info('Stop pretraining discriminator before epoch %s', epoch)

  def epoch_finished(self, epoch):
    pass

  # -- outputs & state ------------------------------------------------------------------------

  def predict(self, batch):
    batch = self._device_put(batch)
    self._ensure_initialized(batch)
    if not hasattr(self, '_predict_fn'):
      def _predict(state, b):
        with jax.default_matmul_precision('high'):  # eval fidelity
          return self._apply_net(
              self.gen, state['params'], state['batch_stats'],
              self._gen_inputs(b), False, None, self.gen_has_train_arg)[0]
      self._predict_fn = serving_jit(_predict)
    return self._predict_fn(self.gen_state, batch)

  def export_predict_parts(self):
    """(pure generator predict fn, generator state, generator input keys)
    for the jax.export serving artifact
    (:mod:`csmri_refinement_tpu.utils.export`)."""
    def fn(state, b):
      with jax.default_matmul_precision('high'):  # eval fidelity
        return self._apply_net(
            self.gen, state['params'], state['batch_stats'],
            self._gen_inputs(b), False, None, self.gen_has_train_arg)[0]
    return fn, self.gen_state, list(self.gen_input_keys)

  def get_named_outputs(self, data):
    batch, out_gen = data[0], data[1]
    prediction = out_gen['pred'] if isinstance(out_gen, dict) else out_gen
    target = batch['target']
    if self.output_transform is not None:
      prediction, target = self.output_transform(prediction, target)
    return {
        'input': batch['inp'],
        'prediction': prediction,
        'target': target,
        'disc_fake': data[2] if len(data) > 2 else None,
    }

  def get_named_models(self):
    return {'generator': self.gen, 'discriminator': self.disc}

  def state_dict(self):
    assert self.gen_state is not None, 'Runner state not initialized'
    out = {
        'generator': {
            'params': serialization.to_state_dict(self.gen_state['params']),
            'batch_stats': serialization.to_state_dict(
                self.gen_state['batch_stats']),
        },
    }
    if 'opt_state' in self.gen_state:
      out['gen_optimizer'] = serialization.to_state_dict(
          self.gen_state['opt_state'])
    if self.disc_state is not None:
      out['discriminator'] = {
          'params': serialization.to_state_dict(
              self.disc_state['params']),
          'batch_stats': serialization.to_state_dict(
              self.disc_state['batch_stats']),
      }
      if 'opt_state' in self.disc_state:
        out['disc_optimizer'] = serialization.to_state_dict(
            self.disc_state['opt_state'])
    return out

  def load_state_dict(self, state_dict):
    if self.gen_state is None:
      self._pending_restore = state_dict
      return
    self._apply_restore(state_dict)

  def _apply_restore(self, state_dict):
    self.gen_state['params'] = serialization.from_state_dict(
        self.gen_state['params'], state_dict['generator']['params'])
    self.gen_state['batch_stats'] = serialization.from_state_dict(
        self.gen_state['batch_stats'],
        state_dict['generator'].get('batch_stats', {}))
    if 'gen_optimizer' in state_dict and 'opt_state' in self.gen_state:
      self.gen_state['opt_state'] = serialization.from_state_dict(
          self.gen_state['opt_state'], state_dict['gen_optimizer'])

    if self.disc_state is not None:
      assert 'discriminator' in state_dict, 'Incompatible checkpoint'
      self.disc_state['params'] = serialization.from_state_dict(
          self.disc_state['params'], state_dict['discriminator']['params'])
      self.disc_state['batch_stats'] = serialization.from_state_dict(
          self.disc_state['batch_stats'],
          state_dict['discriminator'].get('batch_stats', {}))
      if 'disc_optimizer' in state_dict and 'opt_state' in self.disc_state:
        self.disc_state['opt_state'] = serialization.from_state_dict(
            self.disc_state['opt_state'], state_dict['disc_optimizer'])
    logging.debug('Restored adversarial runner state')

  def __str__(self):
    s = 'Generator:\n{}'.format(self.gen)
    if self.disc is not None:
      s += '\nDiscriminator:\n{}'.format(self.disc)
    return s
