"""Multi-process (multi-host) data-parallel integration tests.

The reference tops out at single-process nn.DataParallel (SURVEY.md §2.8);
this framework's multi-host path is ``jax.distributed`` + a global mesh.
These tests run it for real: a 2-process CPU cluster (4 virtual devices per
process, gloo collectives, production ``parallel.distributed.initialize``)
training the same tiny synthetic recipe as one process with 8 devices, and
assert the loss trajectories and validation metrics match — i.e. the
multi-process run is numerically the single-process run.

Covered end-to-end: process-sharded DataLoader slicing, global-batch
assembly via make_array_from_process_local_data (parallel/mesh.py), the
on-device forward model on global arrays (positional mask keys over the
GLOBAL batch), gradient all-reduce through gloo, replicated-state updates,
loss fetches, and the validation gather-to-replicated path for metrics.
"""

import json
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, 'tests', '_dist_child.py')


def _free_port():
  s = socket.socket()
  s.bind(('127.0.0.1', 0))
  port = s.getsockname()[1]
  s.close()
  return port


def _child_env(devices_per_process):
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  # Skip the tunneled-TPU PJRT handshake in children (same guard as
  # __graft_entry__.dryrun_multichip)
  env.pop('PALLAS_AXON_POOL_IPS', None)
  flags = re.sub(r'--xla_force_host_platform_device_count=\d+', '',
                 env.get('XLA_FLAGS', ''))
  env['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count={}'
                      .format(devices_per_process)).strip()
  return env


def _parse_result(out):
  for line in out.splitlines():
    if line.startswith('DISTRESULT '):
      return json.loads(line[len('DISTRESULT '):])
  raise AssertionError('no DISTRESULT line in child output:\n' + out[-3000:])


def _run_world(world, runner, epochs=2, steps_per_fetch=None, spatial=None,
               timeout=600):
  """Run the child across `world` processes; returns each rank's result."""
  port = _free_port()
  env = _child_env(8 // world)
  procs = []
  for rank in range(world):
    cfg = {'repo': REPO, 'world': world, 'rank': rank, 'port': port,
           'runner': runner, 'epochs': epochs,
           'steps_per_fetch': steps_per_fetch, 'spatial': spatial}
    procs.append(subprocess.Popen(
        [sys.executable, CHILD, json.dumps(cfg)], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
  outs = []
  for rank, p in enumerate(procs):
    try:
      out, _ = p.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
      for q in procs:
        q.kill()
      raise
    assert p.returncode == 0, \
        'rank {} failed (rc={}):\n{}'.format(rank, p.returncode, out[-4000:])
    outs.append(_parse_result(out))
  return outs


def _assert_results_close(a, b, atol):
  assert len(a['train']) == len(b['train'])
  for ea, eb in zip(a['train'], b['train']):
    assert set(ea) == set(eb)
    for name in ea:
      np.testing.assert_allclose(ea[name], eb[name], atol=atol, rtol=1e-4,
                                 err_msg='train loss {}'.format(name))
  assert set(a['val']) == set(b['val'])
  for name in a['val']:
    np.testing.assert_allclose(a['val'][name], b['val'][name], atol=atol,
                               rtol=1e-4, err_msg='val {}'.format(name))


def test_two_process_standard_training_matches_single_process():
  single = _run_world(1, 'standard')[0]
  multi = _run_world(2, 'standard')
  # Every rank computes the same replicated losses/metrics
  _assert_results_close(multi[0], multi[1], atol=1e-6)
  # 2-process (gloo all-reduce) == 1-process (in-process all-reduce) up to
  # f32 reduction-order noise
  _assert_results_close(single, multi[0], atol=2e-5)


@pytest.mark.slow
def test_two_process_adversarial_training_matches_single_process():
  single = _run_world(1, 'adversarial')[0]
  multi = _run_world(2, 'adversarial')
  _assert_results_close(multi[0], multi[1], atol=1e-6)
  # GAN step: 5 network passes + pool swaps amplify f32 reduction-order
  # noise; losses at 1e-4 are the semantic claim (same tolerance family as
  # tests/test_parallel.py's spatial-mesh note)
  _assert_results_close(single, multi[0], atol=1e-4)


@pytest.mark.slow
def test_two_process_scanned_standard_training_matches_single_process():
  """steps_per_fetch scan over process-sharded stacked batches."""
  single = _run_world(1, 'standard', steps_per_fetch=2)[0]
  multi = _run_world(2, 'standard', steps_per_fetch=2)
  _assert_results_close(multi[0], multi[1], atol=1e-6)
  _assert_results_close(single, multi[0], atol=2e-5)


@pytest.mark.slow
def test_two_process_spatial_mesh_training_matches_single_process():
  """2-D data x spatial mesh spanning two processes: image rows shard
  inside each process (contiguous grid rows), batch halves split across
  processes; GSPMD halo exchanges ride the in-process links, the gradient
  all-reduce crosses gloo."""
  single = _run_world(1, 'standard', spatial=2)[0]
  multi = _run_world(2, 'standard', spatial=2)
  _assert_results_close(multi[0], multi[1], atol=1e-6)
  # halo-exchange reduction-order noise on top of the gloo all-reduce
  _assert_results_close(single, multi[0], atol=1e-4)


def test_loader_process_shard_slices_batches():
  from csmri_refinement_tpu.data.loader import DataLoader

  class _DS:
    def __len__(self):
      return 10

    def __getitem__(self, i):
      return {'x': np.full((2,), i, np.float32)}

  full = list(DataLoader(_DS(), 4, shuffle=True, seed=7))
  r0 = list(DataLoader(_DS(), 4, shuffle=True, seed=7,
                       process_shard=(0, 2)))
  r1 = list(DataLoader(_DS(), 4, shuffle=True, seed=7,
                       process_shard=(1, 2)))
  # Same epoch structure; concat of rank slices == the global batch
  assert len(r0) == len(r1) == len(full) == 3
  for fb, b0, b1 in zip(full, r0, r1):
    np.testing.assert_array_equal(
        np.concatenate([b0['x'], b1['x']]), fb['x'])
  # Ragged final batch (10 % 4 = 2) splits 1/1 across the two ranks
  assert r0[-1]['x'].shape[0] == r1[-1]['x'].shape[0] == 1

  # A final batch smaller than the process count is dropped on every rank
  class _DS9(_DS):
    def __len__(self):
      return 9

  r0 = list(DataLoader(_DS9(), 4, process_shard=(0, 4)))
  loader = DataLoader(_DS9(), 4, process_shard=(0, 4))
  assert len(r0) == len(loader) == 2
