"""Model parameter summaries (reference utils/diagnostics.py:5-56)."""

import numpy as np
import jax


def _count(tree):
  return sum(int(np.prod(p.shape))
             for p in jax.tree_util.tree_leaves(tree) if hasattr(p, 'shape'))


def print_model_parameters(runner):
  """Print per-model parameter counts of a runner.

  Counts come from the runner's initialized state when available; flax
  parameters don't exist before the first batch, so uninitialized runners
  print the module structure instead.
  """
  state = getattr(runner, 'state', None)
  states = {}
  if state is not None and 'params' in state:
    states['model'] = state['params']
  for attr, name in (('gen_state', 'generator'), ('disc_state',
                                                  'discriminator')):
    s = getattr(runner, attr, None)
    if s is not None and 'params' in s:
      states[name] = s['params']

  if not states:
    print('Runner not yet initialized; model structure:')
    print(str(runner))
    return

  total = 0
  for name, params in states.items():
    n = _count(params)
    total += n
    print('{}: {:,} parameters'.format(name, n))
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
      print('  {}: {} -> {:,}'.format(
          jax.tree_util.keystr(path), tuple(leaf.shape),
          int(np.prod(leaf.shape))))
  print('Total: {:,} parameters'.format(total))
