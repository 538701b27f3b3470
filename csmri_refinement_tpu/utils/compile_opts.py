"""Measured XLA compiler options for the TPU serving/eval path.

No reference analogue (the reference has no compiler-tuning layer); this is
TPU-specific tuning with no semantic effect on results:

* `xla_tpu_scoped_vmem_limit_kib` changes how much VMEM XLA's fusion
  passes may budget per fused computation, which controls conv fusion
  depth on the flagship's traffic-bound C32/C64 U-Net layers.
  Sweep evidence (scripts/probe_xla_flags.py on the v5e, NOTES round 3):

      256^2 B128: baseline 2359 -> 40 MiB 2507 slices/s (+6.3%)
      512^2 B128: baseline  566 -> 64 MiB  587 slices/s (+3.8%)

  Both optima sit well above the backend default; past them the deeper
  fusions spill. With the bundle-aware cost model on (round 5), the
  paired-protocol fine scan moved the <512^2 optimum to 32 MiB
  (+0.55% over 40 MiB, reproduced across two fresh processes; the
  response is non-monotonic — 36 MiB is -0.45% — so these are discrete
  schedule choices, not a smooth curve; NOTES round 5 session 2).
  Override with CSMRI_TPU_SCOPED_VMEM_KIB (0 drops it).

* `xla_tpu_use_bundle_aware_cost_model_for_fusions` makes the fusion
  cost model account for instruction bundling. Paired-window A/B on the
  v5e (probe_xla_flags --ab, NOTES round 5): +1.3% median at 256^2
  (positive in 6/6 interleaved pairs), but -2.5% at 512^2 — so it ships
  gated to image_size < 512, exactly like the per-resolution VMEM
  optimum. Override with CSMRI_TPU_BUNDLE_AWARE_COST=1/0.
"""

import os

# Measured optima (KiB). 256^2 peaks at 32 MiB (under the bundle-aware
# cost model; 40 MiB before it), 512^2 at 64 MiB; the helper picks by
# image size when the caller knows it.
_DEFAULT_KIB = 32768
_LARGE_IMAGE_KIB = 65536
_BUNDLE_FLAG = 'xla_tpu_use_bundle_aware_cost_model_for_fusions'


def serving_compiler_options(image_size=None):
  """Per-jit `compiler_options` dict for eval/serving entry points.

  Returns None (no override) off-TPU or when every option is disabled
  via its env kill switch (CSMRI_TPU_SCOPED_VMEM_KIB=0,
  CSMRI_TPU_BUNDLE_AWARE_COST=0).
  """
  import jax
  try:
    if jax.default_backend() != 'tpu':
      return None
  except Exception:  # backend init failure: never block the caller
    return None
  large = (image_size or 0) >= 512
  options = {}
  env = os.environ.get('CSMRI_TPU_SCOPED_VMEM_KIB')
  if env is not None:
    if env.strip() not in ('', '0'):
      options['xla_tpu_scoped_vmem_limit_kib'] = env.strip()
  else:
    kib = _LARGE_IMAGE_KIB if large else _DEFAULT_KIB
    options['xla_tpu_scoped_vmem_limit_kib'] = str(kib)
  benv = os.environ.get('CSMRI_TPU_BUNDLE_AWARE_COST')
  if benv is not None:
    bundle_on = benv.strip() not in ('', '0')
  else:
    bundle_on = not large  # measured loser at 512^2 (NOTES round 5)
  if bundle_on:
    options[_BUNDLE_FLAG] = 'true'
  return options or None


class _FallbackJit:
  """A jitted callable that drops rejected compiler options, failure-safely.

  The scoped-VMEM serving option is load-bearing on every val/predict jit;
  if a relay/libtpu build rejects the per-jit `compiler_options` (one
  hypothesis for the round-3 driver-time RuntimeError; the relay was later
  observed 500-ing other options), evaluation must degrade to the plain
  jit — slightly slower — instead of dying.

  Rejection is detected by compiling a TRIVIAL probe with the same options
  before the first real call: option rejection does not depend on the
  program, the probe compile is cheap, and — critically — the real
  program's own runtime errors (e.g. RESOURCE_EXHAUSTED after donated
  buffers were consumed) are never caught or retried, so they surface
  as themselves rather than as a misleading donation error.
  """

  def __init__(self, fn, options, **jit_kwargs):
    import jax
    self._fn = fn
    self._jit_kwargs = jit_kwargs
    self._options = options
    self._active = jax.jit(fn, compiler_options=options, **jit_kwargs)
    self._guarded = options is not None

  def _options_rejected(self):
    """Compile+run a trivial jit with the same compiler options; returns
    the exception if the backend rejects them, else None."""
    import jax
    import jax.numpy as jnp
    try:
      probe = jax.jit(lambda x: (x + 1.0).sum(),
                      compiler_options=self._options)
      float(probe(jnp.zeros((8, 128), jnp.float32)))  # f32 scalar fetch
      return None
    except jax.errors.JaxRuntimeError as e:
      return e

  def __call__(self, *args, **kwargs):
    if self._guarded:
      self._guarded = False
      import jax
      err = self._options_rejected()
      if err is not None:
        import logging
        logging.getLogger(__name__).error(
            'compiler_options rejected by the backend (%s: %s); '
            'proceeding WITHOUT compiler options — set '
            'CSMRI_TPU_SCOPED_VMEM_KIB=0 and CSMRI_TPU_BUNDLE_AWARE_COST=0 '
            'to silence',
            type(err).__name__, err)
        self._active = jax.jit(self._fn, **self._jit_kwargs)
    return self._active(*args, **kwargs)


def serving_jit(fn=None, *, image_size=None, **jit_kwargs):
  """`jax.jit` with the measured serving compiler options applied.

  Usable as a decorator or a wrapper; extra kwargs pass through to jit.
  The returned callable retries its first call without the options if the
  backend rejects them (see _FallbackJit).
  """
  import functools
  if fn is None:
    return functools.partial(serving_jit, image_size=image_size,
                             **jit_kwargs)
  options = serving_compiler_options(image_size)
  if options is None:
    import jax
    return jax.jit(fn, **jit_kwargs)
  return _FallbackJit(fn, options, **jit_kwargs)


def training_jit(fn, **jit_kwargs):
  """`jax.jit` for TRAIN steps with the opt-in scoped-VMEM option applied
  failure-safely (option rejection detected by a trivial probe compile
  before the first real call — see _FallbackJit).

  Safe with donated buffers: the probe carries the option-rejection risk;
  the real step's own runtime errors propagate un-retried, so donated
  arguments are never re-used after a failed execution.
  """
  import jax
  options = training_compiler_options()
  if options is None:
    return jax.jit(fn, **jit_kwargs)
  return _FallbackJit(fn, options, **jit_kwargs)


def training_compiler_options():
  """Opt-in scoped-VMEM override for TRAIN steps.

  Unlike the serving path, no training default ships: set
  CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB to measure (bench.py --train picks it
  up through the runners' step jits). Off-TPU or unset: None.
  """
  import jax
  try:
    if jax.default_backend() != 'tpu':
      return None
  except Exception:
    return None
  env = os.environ.get('CSMRI_TPU_TRAIN_SCOPED_VMEM_KIB')
  if not env or env.strip() in ('', '0'):
    return None
  return {'xla_tpu_scoped_vmem_limit_kib': env.strip()}
