"""jax.export serving-artifact tests (utils/export.py, export_model.py).

The artifact must replay the restored network bit-faithfully (within the
DC-lowering tolerance), carry multi-platform lowerings (cpu + tpu from a
CPU host), and round-trip through the single-file container.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csmri_refinement_tpu.utils.config import Configuration
from csmri_refinement_tpu.utils.export import (
    MAGIC, export_predict, load_artifact, load_callable, save_artifact,
    verify_artifact)


def test_artifact_container_roundtrip(tmp_path):
  from jax import export as jax_export

  def f(b):
    return {'y': b['x'] * 2.0 + 1.0}

  feed = {'x': jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
  exported = jax_export.export(jax.jit(f), platforms=('cpu', 'tpu'))(feed)
  path = str(tmp_path / 'toy.shlo')
  save_artifact(path, exported, {'format': 1, 'input_keys': ['x']},
                extra_meta={'note': 'toy'})

  loaded, header = load_artifact(path)
  assert header['meta']['note'] == 'toy'
  assert header['payload_bytes'] > 0
  np.testing.assert_allclose(loaded.call(feed)['y'],
                             np.asarray(feed['x']) * 2.0 + 1.0)

  call, header2 = load_callable(path)
  # Extra keys are ignored; the jitted replay matches
  out = call({'x': feed['x'], 'target': jnp.zeros(())})
  np.testing.assert_allclose(out['y'], np.asarray(feed['x']) * 2.0 + 1.0)
  assert header2['input_keys'] == ['x']


def test_artifact_bad_magic_raises(tmp_path):
  path = str(tmp_path / 'bogus.shlo')
  with open(path, 'wb') as f:
    f.write(b'NOT-AN-ARTIFACT' + b'\x00' * 32)
  with pytest.raises(ValueError, match='bad magic'):
    load_artifact(path)


@pytest.mark.slow
@pytest.mark.e2e
def test_export_cli_standard_roundtrip(tmp_path):
  import export_model as export_cli

  conf = {
      'seed': 0,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 4, 'num_val': 4},
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2,
                        'variable_acceleration': False},
      'runner_type': 'standard',
      'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 1, 'num_convs': 2,
                'num_filters': 4},
  }
  conf_path = str(tmp_path / 'conf.json')
  with open(conf_path, 'w') as f:
    json.dump(conf, f)
  out_path = str(tmp_path / 'model.shlo')

  rc = export_cli.main([conf_path, 'NONE', out_path, '-b', '2', '--verify'])
  assert rc == 0
  assert os.path.exists(out_path)
  with open(out_path, 'rb') as f:
    assert f.read(len(MAGIC)) == MAGIC

  exported, header = load_artifact(out_path)
  assert sorted(header['platforms']) == ['cpu', 'tpu']
  assert header['input_keys'] == ['inp', 'kspace', 'mask']
  assert header['input_shapes']['inp'] == [2, 32, 32, 2]
  assert header['meta']['runner_type'] == 'standard'

  # The replay matches an independently-built runner with the same seed
  # (fresh process state; NONE checkpoint → seeded init is deterministic).
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils import set_random_seeds
  set_random_seeds(0)
  runner = build_runner(Configuration.from_dict(conf), 'standard',
                        mode='test')
  dataset = load_dataset(Configuration.from_dict(conf), '', 'Synthetic',
                         'val')
  loader = DataLoader(dataset, batch_size=2, num_workers=1, shuffle=False)
  host_batch = next(iter(loader))
  diff = verify_artifact(out_path, runner, host_batch)
  assert diff < 1e-4, diff


@pytest.mark.slow
@pytest.mark.e2e
def test_export_adversarial_generator_roundtrip(tmp_path):
  """The flagship composite (frozen RecNet + refinement U-Net inside
  RefinementWrapper) exports and replays through the generator path."""
  from tests.test_adversarial import _conf
  from csmri_refinement_tpu.data import DataLoader, load_dataset
  from csmri_refinement_tpu.training import build_runner
  from csmri_refinement_tpu.utils import set_random_seeds

  conf = _conf()
  set_random_seeds(1)
  runner = build_runner(conf, 'adversarial', mode='test')
  dataset = load_dataset(conf, '', 'Synthetic', 'val')
  loader = DataLoader(dataset, batch_size=2, num_workers=1, shuffle=False)
  host_batch = next(iter(loader))

  exported, header = export_predict(runner, host_batch)
  path = str(tmp_path / 'gen.shlo')
  save_artifact(path, exported, header)

  diff = verify_artifact(path, runner, host_batch)
  assert diff < 1e-4, diff

  # Output structure survives the round trip (dict with the wrapper keys)
  call, _ = load_callable(path)
  batch = runner.preparer.prepare_val(host_batch)
  out = call(batch)
  assert isinstance(out, dict) and 'pred' in out
  assert out['pred'].shape == (2, 32, 32, 2)
