"""Multi-host initialization.

The reference has no multi-process/multi-node support at all (SURVEY.md
§2.8 — single-process nn.DataParallel only). The TPU-native upgrade path is
``jax.distributed``: each host runs the same program, sees its local
devices, and the global mesh spans all hosts with collectives riding
ICI within a slice and DCN across slices.

Call :func:`initialize` once at process start (train.py does this when the
config has a ``distributed`` section or the standard JAX cluster env vars
are present). On a single host this is a no-op.
"""

import logging
import os


def _cpu_platform_requested():
  """True when this process will run on the CPU backend (explicit
  JAX_PLATFORMS=cpu env or jax_platforms config)."""
  import jax
  platforms = os.environ.get('JAX_PLATFORMS', '')
  try:
    platforms = jax.config.jax_platforms or platforms
  except AttributeError:
    pass
  return (platforms or '').split(',')[0].strip() == 'cpu'


def initialize(conf=None):
  """Initialize jax.distributed from config or environment; safe no-op
  when single-host."""
  import jax

  dist_conf = {}
  if conf is not None:
    dist_conf = conf.get_attr('distributed', default={}) or {}

  coordinator = dist_conf.get('coordinator_address',
                              os.environ.get('JAX_COORDINATOR_ADDRESS'))
  num_processes = dist_conf.get('num_processes',
                                os.environ.get('JAX_NUM_PROCESSES'))
  process_id = dist_conf.get('process_id',
                             os.environ.get('JAX_PROCESS_ID'))

  if coordinator is None and num_processes is None:
    logging.debug('Single-host run; skipping jax.distributed.initialize')
    return False

  kwargs = {}
  if coordinator is not None:
    kwargs['coordinator_address'] = coordinator
  if num_processes is not None:
    kwargs['num_processes'] = int(num_processes)
  if process_id is not None:
    kwargs['process_id'] = int(process_id)

  # XLA:CPU's cross-process collectives need the gloo transport selected
  # before backend init (TPU/GPU pods bring their own ICI/DCN transport).
  # This is what lets the multi-process path run — and be integration-
  # tested — on a CPU-only host (tests/test_distributed.py).
  if _cpu_platform_requested():
    try:
      jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    except Exception:  # older jaxlib without the option: leave default
      logging.warning('Could not select gloo CPU collectives')

  jax.distributed.initialize(**kwargs)
  logging.info('jax.distributed initialized: process %s/%s, %d local / %d '
               'global devices', jax.process_index(), jax.process_count(),
               jax.local_device_count(), jax.device_count())
  return True
