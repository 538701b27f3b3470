"""Shared utilities: seeding, logging setup, pytree helpers.

Replaces the reference's device utilities (/root/reference/utils/__init__.py):
`cudaify`/`cpuify`/`make_variables` disappear in JAX (arrays are committed to
devices by jit/sharding), and `set_cuda_env` GPU selection becomes mesh/device
configuration in :mod:`csmri_refinement_tpu.parallel`.
"""

import random

import numpy as np
import jax


def set_random_seeds(seed):
  """Seed python + numpy global RNGs and return a root jax PRNG key.

  The reference seeds random/np/torch (utils/__init__.py:24-30). JAX RNG is
  stateless, so the root key returned here must be threaded explicitly.
  """
  random.seed(seed)
  np.random.seed(seed)
  return jax.random.PRNGKey(seed)


def host_fetch(tree):
  """Device→host copy of a pytree of jax arrays (numpy out)."""
  return jax.tree_util.tree_map(
      lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)


def tree_size(tree):
  """Total number of parameters in a pytree."""
  leaves = jax.tree_util.tree_leaves(tree)
  return sum(int(np.prod(leaf.shape)) for leaf in leaves if hasattr(leaf, 'shape'))
