"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (the reference has no
multi-device test capability at all; see SURVEY.md §4).
"""

import os

# The ambient environment may pin JAX_PLATFORMS to a TPU tunnel (e.g.
# 'axon') and sitecustomize may import jax at interpreter startup, so setting
# env vars here can be too late — update jax config directly as well. Unit
# tests always run on the virtual CPU mesh.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
  config.addinivalue_line(
      'markers',
      'slow: heavyweight end-to-end/architecture tests '
      '(quick loop: pytest -m "not slow", ~10 min on 1 CPU core — the '
      '8-device mesh tests serialize; full suite ~45 min on 1 CPU)')
  config.addinivalue_line(
      'markers',
      'parity: torch-twin / golden forward-parity tests (subset of slow; '
      'run alone with -m parity)')
  config.addinivalue_line(
      'markers',
      'e2e: CLI / training end-to-end tests (subset of slow; '
      'run alone with -m e2e)')


@pytest.fixture(autouse=True)
def _reset_spatial_mesh_flag():
  """mesh_from_conf / tests flip the process-global spatial-mesh switch
  (GEMM DC + matmul-DFT forcing, ops/dc.py + ops/fft.py); keep every test
  order-independent."""
  yield
  from csmri_refinement_tpu.ops import dc
  dc.set_spatial_mesh(False)


@pytest.fixture
def rng():
  return np.random.RandomState(0)
