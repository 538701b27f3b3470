#!/usr/bin/env python
"""Benchmark: RecNet cascade + refinement inference throughput.

Measures 256×256 reconstruction slices/sec/chip for the flagship pipeline
(RecNet(3×3×32) + refinement U-Net wrapper, the configs/1+2 recipe) against
the BASELINE.json north-star target of ≥5,000 slices/sec/chip on TPU v5e.

Prints ONE JSON line on stdout: either
  {"metric", "value", "unit", "vs_baseline"}            (a measurement), or
  {"metric", "error", "stage", "unit"}                   (structured failure).

The record is UNLOSABLE by construction (VERDICT r3 #1): the default
invocation runs a thin watchdog parent (no jax import) that re-executes
this script as a measurement child. The child emits the headline record the
moment it is measured — before any best-effort extras — and the parent
relays it to stdout immediately. If the child hangs (the tunneled PJRT
backend can wedge inside C calls, where Python signal handlers never run),
crashes, or overruns the wall-clock budget, the parent kills it by PID and
prints a structured error line instead. Nothing short of SIGKILLing the
parent before the headline lands can produce empty stdout.

Stage markers let the parent distinguish an infra outage
("backend_init_hang" — preflight matmul never completed) from a code
failure (stage "measure"/"build").
"""

import argparse
import json
import os
import sys
import time

TARGET = 5000.0  # slices/sec/chip (BASELINE.json north star)

_CHILD_ENV = '_CSMRI_BENCH_CHILD'
# The preflight (import jax + tiny jitted matmul) includes backend init and
# first-compile latency: measured ~67 s healthy. 210 s separates "slow" from
# "wedged".
_PREFLIGHT_DEADLINE_S = 210.0
_DEFAULT_BUDGET_S = 540.0


def _metric_name(image_size, dtype_str):
  return ('{s}x{s} recon slices/sec/chip (cascade+refine inference, '
          '{d} compute)'.format(s=image_size, d=dtype_str))


# ---------------------------------------------------------------------------
# Watchdog parent: no jax, just child supervision + the stdout contract.
# ---------------------------------------------------------------------------


def parent_main(argv, args):
  import queue
  import signal
  import subprocess
  import threading

  budget = args.budget
  if budget is None:
    default = _DEFAULT_BUDGET_S
    if args.train or args.components or args.latency or args.extra_sizes:
      default = 4 * _DEFAULT_BUDGET_S  # dev runs with extras take far longer
    budget = float(os.environ.get('CSMRI_BENCH_BUDGET_S', default))

  env = dict(os.environ)
  env[_CHILD_ENV] = '1'
  child = subprocess.Popen(
      [sys.executable, os.path.abspath(__file__)] + list(argv),
      stdout=subprocess.PIPE, env=env, text=True, bufsize=1)

  lines = queue.Queue()

  def _reader():
    try:
      for line in child.stdout:
        lines.put(line)
    finally:
      lines.put(None)

  threading.Thread(target=_reader, daemon=True).start()

  state = {'stage': 'spawn', 'printed': False, 'headline': False}

  def emit(record):
    if state['printed']:
      return
    state['printed'] = True
    print(json.dumps(record))
    sys.stdout.flush()

  def emit_error(error):
    emit({'metric': _metric_name(args.image_size, args.dtype),
          'error': error, 'stage': state['stage'], 'unit': 'slices/s'})

  def finish(error, rc):
    try:
      child.kill()
    except Exception:
      pass
    # Salvage anything the child already emitted but we haven't drained:
    # a headline sitting in the queue at deadline time is still a valid
    # record ("unlosable" means deadline checks can't outrank it). The
    # reader thread may still be flushing the killed child's buffered
    # stdout into the queue, so wait (briefly, bounded) for its EOF
    # sentinel instead of racing it with get_nowait.
    drain_deadline = time.monotonic() + 2.0
    while not state['headline']:
      try:
        line = lines.get(timeout=max(0.0,
                                     drain_deadline - time.monotonic()))
      except queue.Empty:
        break
      if line is None:
        break
      try:
        msg = json.loads(line)
      except ValueError:
        continue
      if msg.pop('_kind', None) == 'headline':
        state['headline'] = True
        emit(msg)
    if state['headline']:
      sys.exit(0)
    emit_error(error)
    sys.exit(rc)

  class _Term(Exception):
    pass

  def _on_signal(signum, frame):
    raise _Term(signal.Signals(signum).name)

  for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    try:
      signal.signal(sig, _on_signal)
    except (ValueError, OSError):
      pass

  start = time.monotonic()
  preflight_ok = False
  try:
    while True:
      # Drain anything already emitted BEFORE judging deadlines: a
      # headline/marker sitting in the queue outranks a deadline that
      # fires while it waits (unlosable-record contract).
      try:
        line = lines.get_nowait()
      except queue.Empty:
        now = time.monotonic()
        if not preflight_ok and now - start > _PREFLIGHT_DEADLINE_S:
          finish('backend_init_hang', 3)
        if now - start > budget:
          finish('budget_exceeded', 3)
        try:
          line = lines.get(timeout=1.0)
        except queue.Empty:
          continue
      if line is None:  # child stdout EOF
        rc = child.wait()
        if state['headline']:
          sys.exit(0)
        finish('child_exit_rc_{}'.format(rc), 3)
      try:
        msg = json.loads(line)
      except ValueError:
        continue  # never let stray child output break the contract
      kind = msg.pop('_kind', None)
      if kind == 'stage':
        state['stage'] = msg.get('stage', state['stage'])
        if state['stage'] == 'preflight_ok':
          preflight_ok = True
      elif kind == 'headline':
        state['headline'] = True
        emit(msg)
  except _Term as e:
    finish(str(e).lower(), 3)


# ---------------------------------------------------------------------------
# Measurement child.
# ---------------------------------------------------------------------------


def _mark(stage):
  print(json.dumps({'_kind': 'stage', 'stage': stage}))
  sys.stdout.flush()


def _headline(record):
  record = dict(record, _kind='headline')
  print(json.dumps(record))
  sys.stdout.flush()


def build_forward(image_size, dtype_str, fused_conv=False):
  """dtype_str: f32 | bf16 | int8 (int8 = bf16 compute with the opt-in
  quantized U-Net serving mode, ops/quantize.py — outside the 0.1 dB
  default quality budget)."""
  import jax
  import jax.numpy as jnp
  from csmri_refinement_tpu.models.recnet import RecNet
  from csmri_refinement_tpu.models.unet import UNET
  from csmri_refinement_tpu.models.refinement_wrapper import (
      RefinementWrapper)
  import csmri_refinement_tpu.ops.undersample as us_ops

  quantized = dtype_str == 'int8'
  dtype = jnp.bfloat16 if dtype_str in ('bf16', 'int8') else None

  # dc_lines_acc=8: the bench batch uses the flagship varden-8x line masks,
  # so the exact skinny DC lowering applies (ops/dc.py; CSMRI_TPU_DC_SKINNY=0
  # for A/B against the dense path).
  pretrained = RecNet(num_blocks=3, num_convs=3, num_filters=32, dtype=dtype,
                      dc_lines_acc=8)
  learnable = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
                   encode_filters=[32, 64, 128], decode_filters=[64, 32],
                   kernel_size=4, upsampling_mode='nn-resize-conv',
                   output_activation='none', padding='reflection',
                   decoder_act_upsampling_only=True, dtype=dtype,
                   fused_inference=fused_conv,
                   quantize_inference=quantized)
  model = RefinementWrapper(pretrained_model=pretrained,
                            learnable_model=learnable,
                            mode='real-penalty-add', input_mode='output')

  # NOTE: everything runs jitted — remote-compile TPU backends (axon) do
  # not support eager op dispatch.
  @jax.jit
  def make_batch(key, batch_size_gt):
    gt = jax.random.uniform(key, batch_size_gt.shape)
    return us_ops.undersample_batch(key, gt, 'varden', 8)

  def batch_for(batch_size):
    shape_token = jnp.zeros((batch_size, image_size, image_size))
    return make_batch(jax.random.PRNGKey(0), shape_token)

  batch = batch_for(2)
  variables = jax.jit(lambda i, k, m: model.init(
      jax.random.PRNGKey(2), i, k, m))(batch['inp'], batch['kspace'],
                                       batch['mask'])

  @jax.jit
  def forward(variables, inp, kspace, mask):
    out = model.apply(variables, inp, kspace, mask)
    return out['pred']

  return forward, variables, batch_for


def run_bench(batch_size, image_size, iters, warmup, dtype_str,
              fused_conv=False):
  import jax
  import jax.numpy as jnp

  forward, variables, batch_for = build_forward(image_size, dtype_str,
                                                fused_conv=fused_conv)

  batch = batch_for(batch_size)
  args = (batch['inp'], batch['kspace'], batch['mask'])

  # The measurement loop is a single compiled lax.scan whose iterations are
  # data-dependent (each consumes the previous reconstruction), ending in a
  # scalar reduce fetched to host. This is robust against the tunneled TPU
  # backend's lazy dispatch: block_until_ready alone does not guarantee
  # execution there, and independent unfetched dispatches could be elided.
  # Serving compiler options: measured scoped-VMEM fusion-budget optimum
  # (+6.3% at 256^2, +3.8% at 512^2 — NOTES round 3) plus the
  # bundle-aware fusion cost model below 512^2 (+1.3% paired A/B,
  # NOTES round 5) — utils/compile_opts.py.
  # _FallbackJit retries the first compile without the options if the
  # relay/libtpu rejects them (VERDICT r3 #2).
  from csmri_refinement_tpu.utils.compile_opts import (
      _FallbackJit, serving_compiler_options)

  def _loop(variables, inp, kspace, mask, n):
    def body(x, _):
      pred = forward(variables, x, kspace, mask)
      return pred.astype(inp.dtype), None
    out, _ = jax.lax.scan(body, inp, None, length=n)
    return jnp.sum(out.astype(jnp.float32))

  bench_loop = _FallbackJit(_loop, serving_compiler_options(image_size),
                            static_argnames='n')

  # Compile both scan variants before timing anything
  val = float(bench_loop(variables, *args, n=warmup))
  assert val == val, 'NaN benchmark output'
  float(bench_loop(variables, *args, n=warmup + iters))

  # Several timed passes, best rate kept: relay dispatch jitter only ever
  # slows a pass down, so max-of-N tightens the downward noise (~2%
  # session scatter observed round 4) at ~5 s per extra pass — cheap
  # against the watchdog budget.
  best = 0.0
  for _ in range(4):
    start = time.perf_counter()
    val = float(bench_loop(variables, *args, n=warmup))
    base = time.perf_counter() - start

    start = time.perf_counter()
    val = float(bench_loop(variables, *args, n=warmup + iters))
    elapsed = time.perf_counter() - start

    # Subtract the fixed dispatch/fetch overhead measured by the warm run
    best = max(best, batch_size * iters / max(elapsed - base, 1e-9))
  return best


def run_components(image_size, batch_size, dtype_str):
  """Per-component ms table (stderr) — regression tripwire for rounds 3+."""
  import jax
  import jax.numpy as jnp
  from csmri_refinement_tpu.models.recnet import RecNet
  from csmri_refinement_tpu.models.unet import UNET
  from csmri_refinement_tpu.ops import dc as dc_ops
  from csmri_refinement_tpu.utils.profiling import timed_scan

  dt = jnp.bfloat16 if dtype_str == 'bf16' else jnp.float32
  b, s = batch_size, image_size
  key = jax.random.PRNGKey(1)
  inp = jax.jit(lambda: jax.random.normal(key, (b, s, s, 2), dt))()
  ksp = jax.jit(lambda: jax.random.normal(key, (b, s, s, 2), jnp.float32))()
  mask = jnp.ones((b, s, s, 1), jnp.float32)

  rows = []
  recnet = RecNet(num_blocks=3, num_convs=3, num_filters=32, dtype=dt)
  rv = jax.jit(recnet.init)(jax.random.PRNGKey(0), inp, ksp, mask)
  # big arrays go through args=, not closure (tunnel constant-size limit)
  rows.append(('recnet 3x3x32',
               timed_scan(lambda x, k, m: recnet.apply(rv, x, k, m), inp,
                          args=(ksp, mask))))

  unet = UNET(num_inputs=2, num_outputs=1, num_layers_per_scale=2,
              encode_filters=[32, 64, 128], decode_filters=[64, 32],
              kernel_size=4, upsampling_mode='nn-resize-conv',
              output_activation='none', padding='reflection',
              decoder_act_upsampling_only=True, dtype=dt)
  uv = jax.jit(lambda x: unet.init(jax.random.PRNGKey(0), x))(inp)
  rows.append(('refinement unet',
               timed_scan(lambda x: jnp.pad(unet.apply(uv, x),
                                            [(0, 0)] * 3 + [(0, 1)]), inp)))

  x32 = inp.astype(jnp.float32)
  rows.append(('dc (fused)',
               timed_scan(lambda x, k, m: dc_ops.data_consistency(x, k, m),
                          x32, args=(ksp, mask))))

  for name, secs in rows:
    sys.stderr.write('component {:24s} {:8.2f} ms/batch ({} B{} {})\n'
                     .format(name, secs * 1e3, s, b, dtype_str))
  sys.stderr.flush()


def _extra_row(row):
  """Best-effort extra measurements ride stderr with a non-JSON prefix.

  The driver merges stdout+stderr and takes the last JSON-looking line as
  the official record — BENCH_r03/r04 were both mis-parsed from a bare
  512-squared stderr row emitted AFTER the stdout headline. 'extra: '
  makes every such line unparseable as JSON while staying grep-able;
  tests/test_cli.py asserts the merged stream holds exactly one bare JSON
  line (the headline)."""
  sys.stderr.write('extra: ' + json.dumps(row) + '\n')
  sys.stderr.flush()


def run_train_bench(image_size, batch_size, steps, train_dtype=None):
  """Flagship GAN training throughput (paper configs/2 recipe on synthetic
  data): steady-state samples/sec of the full D-then-G jitted update.
  Printed to stderr — the stdout contract stays one JSON line."""
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils.config import Configuration

  with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'configs', '2-refinement.json')) as f:
    raw = json.load(f)
  # Shipped paper recipe, with only the dataset swapped to synthetic and
  # the pretrained-RecNet placeholder dropped (random init — identical
  # compute; this is a throughput bench, not a quality run).
  del raw['generator_model']['pretrained_model']['pretrained_weights']
  raw.update({
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': image_size, 'num_train': batch_size * 4,
                    'num_val': batch_size},
      'batch_size': batch_size, 'num_data_workers': 0,
      'vgg_random_init': True,
  })
  if train_dtype:
    raw['train_dtype'] = train_dtype
  tag = ', {} compute'.format(train_dtype) if train_dtype else ''
  conf = Configuration.from_dict(raw)
  runner = build_runner(conf, 'adversarial', mode='train')
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  dataset = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      num_workers=0)
  host_batch = next(iter(loader))

  for _ in range(2):  # compile + warm
    runner._run_one_update(host_batch, True, True)
  start = time.perf_counter()
  for _ in range(steps):  # every step host-fetches its losses
    runner._run_one_update(host_batch, True, True)
  elapsed = time.perf_counter() - start
  sps = batch_size * steps / elapsed
  _extra_row({
      'metric': '{s}x{s} GAN train samples/sec/chip (flagship recipe, '
                'D-then-G step{t})'.format(s=image_size, t=tag),
      'value': round(sps, 2), 'unit': 'samples/s'})

  # Amortized mode: lax.scan k updates per host fetch (steps_per_fetch)
  k = 8
  batches = [host_batch] * k
  runner._run_scanned_updates(batches)  # compile
  start = time.perf_counter()
  for _ in range(max(steps // k, 2)):
    runner._run_scanned_updates(batches)
  elapsed = time.perf_counter() - start
  sps_scan = batch_size * k * max(steps // k, 2) / elapsed
  _extra_row({
      'metric': '{s}x{s} GAN train samples/sec/chip (steps_per_fetch={k} '
                'scan{t})'.format(s=image_size, k=k, t=tag),
      'value': round(sps_scan, 2), 'unit': 'samples/s'})


def run_standard_train_bench(image_size, batch_size, steps,
                             train_dtype=None):
  """Standard-runner training throughput (configs/1 RecNet+MSE recipe on
  synthetic data): per-step fetch and steps_per_fetch=8 scan rows to
  stderr. The single-network step is even more dispatch/fetch-bound than
  the GAN step (NOTES.md round 4)."""
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils.config import Configuration
  from csmri_refinement_tpu.data import DataLoader, load_dataset

  with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'configs', '1-recnet.json')) as f:
    raw = json.load(f)
  raw.update({
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': image_size, 'num_train': batch_size * 4,
                    'num_val': batch_size},
      'batch_size': batch_size, 'num_data_workers': 0,
  })
  if train_dtype:
    raw['train_dtype'] = train_dtype
  tag = ', {} compute'.format(train_dtype) if train_dtype else ''
  conf = Configuration.from_dict(raw)
  runner = build_runner(conf, 'standard', mode='train')
  dataset = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(dataset, batch_size=batch_size, shuffle=False,
                      num_workers=0)
  host_batch = next(iter(loader))

  def one_step():
    return runner._train_step(iter([host_batch]))

  for _ in range(2):  # compile + warm
    one_step()
  start = time.perf_counter()
  for _ in range(steps):
    one_step()
  sps = batch_size * steps / (time.perf_counter() - start)
  _extra_row({
      'metric': '{s}x{s} RecNet train samples/sec/chip (configs/1 recipe, '
                'per-step fetch{t})'.format(s=image_size, t=tag),
      'value': round(sps, 2), 'unit': 'samples/s'})

  k = 8
  batches = [host_batch] * k
  runner._run_scanned_updates(batches)  # compile
  reps = max(steps // k, 2)
  start = time.perf_counter()
  for _ in range(reps):
    runner._run_scanned_updates(batches)
  sps_scan = batch_size * k * reps / (time.perf_counter() - start)
  _extra_row({
      'metric': '{s}x{s} RecNet train samples/sec/chip (steps_per_fetch='
                '{k} scan{t})'.format(s=image_size, k=k, t=tag),
      'value': round(sps_scan, 2), 'unit': 'samples/s'})


def child_main(args):
  # Backend-health preflight: import + tiny jitted matmul + f32 scalar
  # fetch. Wedged-backend hangs stall here, where the parent's deadline
  # turns them into a fast structured "backend_init_hang" record.
  _mark('preflight')
  import jax
  if args.platform:
    jax.config.update('jax_platforms', args.platform)
  import jax.numpy as jnp
  x = jnp.ones((256, 256), jnp.float32)
  assert float(jax.jit(lambda x: (x @ x).sum())(x)) == 256.0 * 256 * 256
  _mark('preflight_ok')

  dtype = args.dtype
  fallback = False
  _mark('measure')
  try:
    if args.profile:
      if jax.default_backend() not in ('cpu', 'gpu'):
        # jax.profiler device tracing HANGS on the tunneled TPU backend
        # (NOTES.md "Profiler status") — refuse rather than wedge the run.
        sys.stderr.write(
            'bench: --profile refused on backend {!r} (device tracing '
            'hangs through the tunnel; use --components / timed_scan '
            'instead, or --platform cpu)\n'.format(jax.default_backend()))
        sys.exit(2)
      from csmri_refinement_tpu.utils.profiling import trace
      with trace(args.profile):
        slices_per_sec = run_bench(args.batch_size, args.image_size,
                                   args.iters, args.warmup, dtype,
                                   fused_conv=args.fused_conv)
    else:
      slices_per_sec = run_bench(args.batch_size, args.image_size, args.iters,
                                 args.warmup, dtype,
                                 fused_conv=args.fused_conv)
  except Exception as e:  # degrade rather than losing the bench record
    sys.stderr.write('bench: {} run failed ({}: {}); retrying f32 batch 32\n'
                     .format(dtype, type(e).__name__, e))
    sys.stderr.flush()
    dtype = 'f32'
    fallback = True
    _mark('measure_fallback')
    try:
      # Cheap: small batch, few iters, and all extras skipped below.
      slices_per_sec = run_bench(32, args.image_size, 3, 2, dtype)
    except Exception as e2:
      _headline({'metric': _metric_name(args.image_size, dtype),
                 'error': '{}: {}'.format(type(e2).__name__, e2)[:300],
                 'stage': 'measure_fallback', 'unit': 'slices/s'})
      return

  # The official record goes out FIRST; everything after is best-effort.
  _headline({
      'metric': _metric_name(args.image_size, dtype),
      'value': round(slices_per_sec, 1),
      'unit': 'slices/s',
      'vs_baseline': round(slices_per_sec / TARGET, 3),
  })

  if fallback:
    return  # keep the fallback cheap: no extras

  _mark('extras')
  if args.components:
    try:
      run_components(args.image_size, args.batch_size, args.dtype)
    except Exception as e:
      sys.stderr.write('bench: --components failed ({})\n'
                       .format(type(e).__name__))

  if args.train:
    # paper recipe batch 5 (per-step fetch + scanned), and the large-batch
    # throughput mode (conv rates on this chip are ∝ min(batch, 128);
    # batch 64 RESOURCE_EXHAUSTs HBM for the 5-network GAN step — 32 is
    # the measured ceiling). Each row is best-effort.
    dtag = ', {} compute'.format(args.train_dtype) if args.train_dtype \
        else ''
    for bs, st in ((5, args.train_steps), (32, max(args.train_steps // 2, 2))):
      try:
        run_train_bench(args.image_size, bs, st,
                        train_dtype=args.train_dtype)
      except Exception as e:
        _extra_row({
            'metric': '{s}x{s} GAN train samples/sec/chip (batch {b}{t})'
                      .format(s=args.image_size, b=bs, t=dtag),
            'error': type(e).__name__})
    # Standard runner (configs/1 recipe): paper batch 20 + throughput 128
    for bs in (20, 128):
      try:
        run_standard_train_bench(args.image_size, bs,
                                 max(args.train_steps, 8),
                                 train_dtype=args.train_dtype)
      except Exception as e:
        _extra_row({
            'metric': '{s}x{s} RecNet train samples/sec/chip (batch {b}{t})'
                      .format(s=args.image_size, b=bs, t=dtag),
            'error': type(e).__name__})

  extra_sizes = args.extra_sizes
  if extra_sizes is None:
    extra_sizes = [512] if args.image_size != 512 else []

  if args.latency:
    # Batch-1 single-slice serving latency (the reference's validate.py
    # pins batch 1). Uses more iters: per-call work is ~100x smaller.
    for size in [args.image_size] + list(extra_sizes):
      try:
        rate = run_bench(1, size, max(args.iters * 5, 30), args.warmup,
                         dtype, fused_conv=args.fused_conv)
        row = {'metric': '{s}x{s} recon batch-1 serving latency '
                         '({d}{f} compute)'.format(
                             s=size, d=dtype,
                             f='+fused' if args.fused_conv else ''),
               'value': round(1e3 / rate, 2), 'unit': 'ms/slice'}
      except Exception as e:
        row = {'metric': '{s}x{s} recon batch-1 serving latency'
                         .format(s=size), 'error': type(e).__name__}
      _extra_row(row)

  # Batch stays at the main bench's value — conv throughput is
  # ∝ min(batch, 128) on this chip regardless of resolution (NOTES.md
  # round 2), so shrinking batch at larger sizes would under-report.
  for size in extra_sizes:
    try:
      extra = run_bench(max(args.batch_size, 8), size, args.iters,
                        args.warmup, dtype, fused_conv=args.fused_conv)
      row = {'metric': _metric_name(size, dtype),
             'value': round(extra, 1), 'unit': 'slices/s'}
    except Exception as e:
      row = {'metric': '{s}x{s} recon slices/sec/chip'.format(s=size),
             'error': type(e).__name__}
    _extra_row(row)


def main(argv):
  parser = argparse.ArgumentParser()
  parser.add_argument('--batch-size', type=int, default=128)
  parser.add_argument('--image-size', type=int, default=256)
  parser.add_argument('--iters', type=int, default=10)
  parser.add_argument('--warmup', type=int, default=3)
  parser.add_argument('--dtype', default='bf16',
                      choices=['f32', 'bf16', 'int8'])
  parser.add_argument('--platform', default=None, choices=['cpu', 'tpu'])
  parser.add_argument('--profile', metavar='DIR', default=None,
                      help='dump a jax.profiler trace of the timed loop')
  parser.add_argument('--components', action='store_true',
                      help='also print a per-component ms table to stderr')
  parser.add_argument('--extra-sizes', type=int, nargs='*', default=None,
                      help='extra resolutions benchmarked to stderr '
                           '(stdout stays one JSON line). Default: the '
                           'paper resolution 512 — VERDICT r2 #3 wants '
                           'the 512^2 number on record for every driver '
                           'run. Pass an empty list to skip.')
  parser.add_argument('--train', action='store_true',
                      help='also bench GAN training throughput (paper '
                           'batch 5; stderr row)')
  parser.add_argument('--latency', action='store_true',
                      help='also bench batch-1 serving latency (the '
                           'reference validates at batch 1) at the main '
                           'and extra sizes; stderr rows')
  parser.add_argument('--train-steps', type=int, default=8)
  parser.add_argument('--train-dtype', default=None,
                      help='mixed-precision training compute dtype for the '
                           '--train rows (e.g. bfloat16); params stay f32')
  parser.add_argument('--fused-conv', action='store_true',
                      help='route eval U-Net conv chains through the fused '
                           'Pallas kernel (ops/conv_pallas.py)')
  parser.add_argument('--budget', type=float, default=None,
                      help='watchdog wall-clock budget in seconds (default '
                           'env CSMRI_BENCH_BUDGET_S or {}); past it the '
                           'best-known record or a structured error is '
                           'emitted'.format(int(_DEFAULT_BUDGET_S)))
  args = parser.parse_args(argv)

  if os.environ.get(_CHILD_ENV):
    child_main(args)
  else:
    parent_main(argv, args)


if __name__ == '__main__':
  main(sys.argv[1:])
