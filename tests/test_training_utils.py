"""Unit tests: LR schedulers, early stopping, metric accumulators, loader."""

import numpy as np
import pytest

from csmri_refinement_tpu.metrics import accumulate_metric
from csmri_refinement_tpu.metrics.metric import MaxMetric, MinMetric
from csmri_refinement_tpu.training.early_stopping import EarlyStopper
from csmri_refinement_tpu.training.lr_schedulers import (MultiStepLR,
                                                         PolynomialDecayLR,
                                                         get_lr_scheduler)
from csmri_refinement_tpu.utils.config import Configuration


def test_multistep_lr():
  sched = MultiStepLR(0.1, decay_steps=[10, 20], decay_factor=0.5)
  assert sched(0) == 0.1
  assert sched(9) == 0.1
  assert sched(10) == pytest.approx(0.05)
  assert sched(19) == pytest.approx(0.05)
  assert sched(20) == pytest.approx(0.025)
  assert sched(100) == pytest.approx(0.025)


def test_polynomial_decay_lr():
  sched = PolynomialDecayLR(0.1, 0.01, decay_epochs=10, from_epoch=0,
                            power=1.0)
  assert sched(0) == pytest.approx(0.1)
  assert sched(5) == pytest.approx(0.055)
  assert sched(10) == pytest.approx(0.01)
  assert sched(50) == pytest.approx(0.01)  # clamps cleanly (SURVEY §7 quirk)

  delayed = PolynomialDecayLR(0.1, 0.0, decay_epochs=10, from_epoch=5)
  assert delayed(3) == pytest.approx(0.1)
  assert delayed(10) == pytest.approx(0.05)


def test_lr_scheduler_factory():
  conf = Configuration.from_dict({'learning_rate': 0.1,
                                  'decay_steps': [5],
                                  'decay_factor': 0.1})
  sched = get_lr_scheduler(conf, 'multistep')
  assert sched(5) == pytest.approx(0.01)

  conf = Configuration.from_dict({'learning_rate': 0.1,
                                  'end_learning_rate': 0.0,
                                  'decay_steps': 10})
  sched = get_lr_scheduler(conf, 'linear')
  assert sched(5) == pytest.approx(0.05)

  with pytest.raises(ValueError):
    get_lr_scheduler(conf, 'cosine')


def test_early_stopper_patience():
  stopper = EarlyStopper('psnr', patience=3)
  stopper.record_best_value(MaxMetric(30.0), epoch=2)
  for epoch in range(1, 8):
    stopper.record_value(MaxMetric(29.0), epoch)
  assert not stopper.should_stop(4)
  assert stopper.should_stop(5)
  assert 'did not improve' in stopper.stop_reason(5)


def test_early_stopper_warmup():
  stopper = EarlyStopper('psnr', patience=1)
  stopper.record_value(MaxMetric(10.0), 1)
  # best_value_epoch == 0 → still warming up
  assert not stopper.should_stop(5)


def test_early_stopper_min_value():
  stopper = EarlyStopper('ssim', patience=1, min_value=0.5)
  stopper.record_best_value(MaxMetric(0.9), 1)
  stopper.record_value(MaxMetric(0.4), 2)
  assert stopper.should_stop(2)
  stopper.record_value(MaxMetric(0.8), 3)
  assert not stopper.should_stop(3)


def test_early_stopper_max_difference():
  stopper = EarlyStopper('psnr', patience=2, max_difference=1.0)
  stopper.record_best_value(MaxMetric(30.0), 1)
  for epoch, value in ((1, 30.0), (2, 29.5), (3, 28.0)):
    stopper.record_value(MaxMetric(value), epoch)
  assert stopper.should_stop(3)  # dropped 2.0 over patience window


def test_metric_accumulators():
  m = MinMetric([1.0, 2.0, 3.0])
  assert m.average().value == pytest.approx(2.0)
  assert MinMetric(1.0) > MinMetric(2.0)       # smaller is better
  assert MaxMetric(2.0) > MaxMetric(1.0)
  assert MinMetric(0.0).worst_value.value == float('inf')
  assert MaxMetric(0.0).worst_value.value == float('-inf')

  metrics = {}
  accumulate_metric(metrics, 'loss', MinMetric(1.0))
  accumulate_metric(metrics, 'loss', MinMetric(3.0))
  assert metrics['loss'].average().value == pytest.approx(2.0)

  # adaptive precision stringification
  assert str(MaxMetric(0.12345678)) == '0.1235'
  assert str(MaxMetric(1e-6)) == '0.00000100'


def test_dataloader_behaviors():
  from csmri_refinement_tpu.data.loader import DataLoader

  class DS:
    def __len__(self):
      return 10

    def __getitem__(self, i):
      return {'x': np.full((2,), i, np.float32)}

  loader = DataLoader(DS(), batch_size=4)
  batches = list(loader)
  assert len(batches) == 3
  assert batches[-1]['x'].shape == (2, 2)  # remainder kept

  loader = DataLoader(DS(), batch_size=4, drop_last=True)
  assert len(list(loader)) == 2

  loader = DataLoader(DS(), batch_size=4, num_samples=4)
  assert len(list(loader)) == 1

  with pytest.raises(ValueError):
    DataLoader(DS(), batch_size=4, num_samples=100)

  # deterministic shuffle per seed
  l1 = DataLoader(DS(), batch_size=10, shuffle=True, seed=3)
  l2 = DataLoader(DS(), batch_size=10, shuffle=True, seed=3)
  np.testing.assert_array_equal(next(iter(l1))['x'], next(iter(l2))['x'])

  # threaded workers produce the same content
  loader = DataLoader(DS(), batch_size=4, num_workers=2)
  batches = list(loader)
  np.testing.assert_array_equal(batches[0]['x'][:, 0], [0, 1, 2, 3])


def test_analyze_roundtrip(tmp_path):
  """Write a minimal Analyze 7.5 pair and read it back."""
  import struct
  from csmri_refinement_tpu.data.analyze_io import load_analyze

  data = np.arange(4 * 3 * 2, dtype=np.int16).reshape(4, 3, 2, order='F')
  header = bytearray(348)
  struct.pack_into('<i', header, 0, 348)
  struct.pack_into('<8h', header, 40, 3, 4, 3, 2, 0, 0, 0, 0)
  struct.pack_into('<h', header, 70, 4)  # int16
  struct.pack_into('<f', header, 112, 2.0)  # scale

  base = tmp_path / 'vol'
  with open(str(base) + '.hdr', 'wb') as f:
    f.write(header)
  with open(str(base) + '.img', 'wb') as f:
    f.write(data.tobytes(order='F'))

  vol = load_analyze(str(base) + '.img')
  assert vol.shape == (4, 3, 2)
  np.testing.assert_allclose(vol, 2.0 * np.asarray(data, np.float32))


def test_serving_compiler_options_gating(monkeypatch):
  """compile_opts: off-TPU returns None; env var overrides and disables;
  image-size selects the measured per-resolution optimum (NOTES round 3)."""
  import jax
  from csmri_refinement_tpu.utils import compile_opts as co

  # The test suite runs on CPU, so the real gate yields None.
  assert co.serving_compiler_options() is None

  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  bundle = 'xla_tpu_use_bundle_aware_cost_model_for_fusions'
  # <512^2: 32 MiB VMEM + bundle-aware cost model (both measured wins).
  assert co.serving_compiler_options() == {
      'xla_tpu_scoped_vmem_limit_kib': '32768', bundle: 'true'}
  # >=512^2: 64 MiB VMEM, bundle flag dropped (measured -2.5%, NOTES r5).
  assert co.serving_compiler_options(image_size=512) == {
      'xla_tpu_scoped_vmem_limit_kib': '65536'}
  monkeypatch.setenv('CSMRI_TPU_SCOPED_VMEM_KIB', '12345')
  assert co.serving_compiler_options(image_size=512) == {
      'xla_tpu_scoped_vmem_limit_kib': '12345'}
  # Per-flag kill switches; all-off returns None (plain jit).
  monkeypatch.setenv('CSMRI_TPU_BUNDLE_AWARE_COST', '1')
  assert co.serving_compiler_options(image_size=512) == {
      'xla_tpu_scoped_vmem_limit_kib': '12345', bundle: 'true'}
  monkeypatch.setenv('CSMRI_TPU_SCOPED_VMEM_KIB', '0')
  monkeypatch.setenv('CSMRI_TPU_BUNDLE_AWARE_COST', '0')
  assert co.serving_compiler_options() is None
  monkeypatch.delenv('CSMRI_TPU_BUNDLE_AWARE_COST')
  monkeypatch.setenv('CSMRI_TPU_SCOPED_VMEM_KIB', '0')
  assert co.serving_compiler_options() == {bundle: 'true'}

  # serving_jit degrades to a plain jit on CPU and stays callable.
  monkeypatch.setattr(jax, 'default_backend', lambda: 'cpu')
  monkeypatch.delenv('CSMRI_TPU_SCOPED_VMEM_KIB')
  import jax.numpy as jnp

  @co.serving_jit(image_size=256)
  def f(x):
    return x * 2

  assert float(f(jnp.float32(3))) == 6.0


def test_fallback_jit_retries_without_rejected_compiler_options():
  """VERDICT r3 #2: a backend that rejects the scoped-VMEM compiler option
  must not kill the eval path — the first call retries option-free. The
  CPU backend genuinely rejects TPU-only options with JaxRuntimeError,
  exercising the real failure mode."""
  import jax.numpy as jnp
  from csmri_refinement_tpu.utils import compile_opts as co

  calls = []

  def f(x):
    calls.append(1)
    return x * 3

  wrapped = co._FallbackJit(f, {'xla_tpu_scoped_vmem_limit_kib': '40960'})
  assert float(wrapped(jnp.float32(2))) == 6.0  # recovered
  assert not wrapped._guarded
  assert float(wrapped(jnp.float32(4))) == 12.0

  # static_argnames passes through to the fallback jit too.
  wrapped2 = co._FallbackJit(lambda x, n: x * n,
                             {'xla_tpu_scoped_vmem_limit_kib': '1'},
                             static_argnames='n')
  assert float(wrapped2(jnp.float32(2), n=5)) == 10.0
