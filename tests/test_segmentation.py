"""Segmentation training + SegmentationScore (SIS) + offline statistics."""

import os

import jax
import numpy as np
import pytest

from csmri_refinement_tpu.data import DataLoader, load_dataset
from csmri_refinement_tpu.training import build_runner
from csmri_refinement_tpu.utils import checkpoints
from csmri_refinement_tpu.utils.config import Configuration


def _seg_conf(**overrides):
  base = {
      'seed': 0,
      'train_dataset': 'Synthetic',
      'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 16, 'num_val': 4},
      'dataset_mode': 'segmentation',
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 8,
                        'variable_acceleration': False},
      'runner_type': 'standard',
      'application': 'segmentation',
      'model': {'name': 'UNET', 'num_inputs': 2, 'num_outputs': 2,
                'num_layers_per_scale': 1, 'encode_filters': [8, 16],
                'decode_filters': [8], 'use_bn': True,
                'upsampling_mode': 'pixelshuffle', 'padding': 'reflection',
                'output_activation': 'none'},
      'loss_name': 'CrossEntropy',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'batch_size': 8,
      'train_metrics': ['dice_class_0', 'dice_class_1'],
      'validation_metrics': ['dice_class_0', 'dice_class_1'],
  }
  base.update(overrides)
  return Configuration.from_dict(base)


@pytest.fixture(scope='module')
def seg_checkpoint(tmp_path_factory):
  conf = _seg_conf()
  runner = build_runner(conf, 'standard', 'train')
  train_set = load_dataset(conf, '/tmp', 'Synthetic', 'train')
  loader = DataLoader(train_set, conf.batch_size, shuffle=True)
  for epoch in range(1, 9):
    losses, metrics = runner.train_epoch(loader, epoch,
                                         steps_per_train_summary=100)
  path = str(tmp_path_factory.mktemp('seg') / 'seg.ckpt')
  checkpoints.save_checkpoint(path, conf, runner, 8, {})
  return conf, runner, losses, metrics, path


def test_segmentation_training(seg_checkpoint):
  conf, runner, losses, metrics, _ = seg_checkpoint
  assert 'loss_CrossEntropy' in losses
  assert 'dice_class_0' in metrics and 'dice_class_1' in metrics
  # Background dice should become reasonable quickly on phantoms
  assert metrics['dice_class_0'].value > 0.6


def test_segmentation_validation_output_transform(seg_checkpoint):
  conf, runner, _, _, _ = seg_checkpoint
  val_set = load_dataset(conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  data, _, val_metrics = runner.validate(loader, 1)
  assert 'dice_class_1' in val_metrics
  named = runner.get_named_outputs(data[0])
  # Output transform: argmax class map with channel dim
  assert named['prediction'].shape == (2, 32, 32, 1)
  classes = np.unique(np.asarray(named['prediction']))
  assert set(classes.tolist()) <= {0, 1}


def test_segmentation_score_metric(seg_checkpoint):
  conf, _, _, _, ckpt_path = seg_checkpoint
  from csmri_refinement_tpu.metrics.segmentation_score import (
      SegmentationScore)
  model_conf = Configuration.from_dict(dict(conf.model,
                                            pretrained_weights=[ckpt_path,
                                                                'model']))
  score = SegmentationScore(model_conf, None, class_idx=1)

  val_set = load_dataset(_seg_conf(), '/tmp', 'Synthetic', 'val')
  item = val_set[0]
  pred = item['inp'][None]  # GT reconstruction through the frozen net
  target = item['target'][None]
  value = score(pred, target)
  assert 0.0 <= value <= 1.0

  # skip_empty_images returns None when no class pixel present
  score_skip = SegmentationScore(model_conf, None, class_idx=1,
                                 skip_empty_images=True)
  empty_target = np.zeros_like(target)
  assert score_skip(pred, empty_target) is None


def test_segmentation_score_via_metric_registry(seg_checkpoint):
  """segmentation_score usable as a validation metric with include_labels."""
  conf, _, _, _, ckpt_path = seg_checkpoint
  rec_conf = Configuration.from_dict({
      'seed': 0,
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 8, 'num_val': 4},
      'include_labels': True,
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2},
      'runner_type': 'standard', 'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 1, 'num_convs': 2,
                'num_filters': 4},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'batch_size': 4,
      'validation_metrics': ['psnr', 'segmentation_score'],
      'segmentation_score_metric': {
          'model': dict(conf.model, pretrained_weights=[ckpt_path, 'model']),
          'class': 1,
          'target_key': 'label',
          'transform': 'none',
      },
  })
  runner = build_runner(rec_conf, 'standard', 'train')
  val_set = load_dataset(rec_conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  _, _, val_metrics = runner.validate(loader)
  assert 'segmentation_score' in val_metrics
  assert 0.0 <= val_metrics['segmentation_score'].value <= 1.0


def test_offline_statistics():
  from csmri_refinement_tpu.data import statistics as stats
  rng = np.random.RandomState(0)
  target = rng.rand(32, 32).astype(np.float32)
  pred = np.clip(target + 0.05 * rng.randn(32, 32).astype(np.float32), 0, 1)

  p = stats.psnr(target, pred, data_range=target.max())
  assert 15 < p < 40
  s = stats.ssim_gaussian(target, pred, data_range=target.max())
  assert 0.2 < s < 1.0
  # identical images → ssim 1
  assert stats.ssim_gaussian(target, target, data_range=1.0) > 0.999

  dataset = [{'case': 'c01_pre', 'slice': i,
              'pred': pred[..., None], 'target': target[..., None],
              'label': (target > 0.5).astype(np.int64),
              'tlabel': (target > 0.5).astype(np.int64)}
             for i in range(3)]
  psnr_series = stats.compute_psnr(dataset)
  assert len(psnr_series) == 3
  ssim_series = stats.compute_ssim(dataset)
  assert np.all(ssim_series.values > 0)
  dice_series = stats.compute_dice_scores(dataset, num_classes=2)
  assert np.allclose(dice_series[1].values, 1.0)


def test_mat_roundtrip_and_case_dataset(tmp_path):
  from csmri_refinement_tpu.data import io_mat
  from csmri_refinement_tpu.data.datasets import SliceDataset

  class FakeDS:
    get_case_and_slice = staticmethod(SliceDataset.get_case_and_slice)

  rng = np.random.RandomState(0)
  arr = rng.rand(1, 8, 8, 2).astype(np.float32)
  path = str(tmp_path / 'c01_pre_slice00.mat')
  io_mat.save_raw(path, 'c01_pre_slice00', arr, arr, arr, FakeDS())

  data = io_mat.load_from_raw(path)
  assert data['case'] == 'c01_pre'
  assert data['slice'] == 0
  np.testing.assert_allclose(data['pred'], arr[0], atol=1e-6)

  cases = io_mat.CaseDataset([data])
  assert cases.get_data('c01_pre', 0) is data
  vols = list(cases.volume_iter())
  assert vols[0]['pred'].shape == (1, 8, 8, 2)


def test_summarize_results_cli(tmp_path, capsys):
  import summarize_results
  import pandas as pd
  df = pd.DataFrame({'psnr': [30.0, 31.0, 32.0],
                     'name': ['a', 'b', 'c']})
  csv1 = str(tmp_path / 'scarseg_runA_2020.csv')
  df.to_csv(csv1)
  df2 = pd.DataFrame({'psnr': [28.0, 29.0, 30.0],
                      'name': ['a', 'b', 'c']})
  csv2 = str(tmp_path / 'scarseg_runB_2020.csv')
  df2.to_csv(csv2)

  summarize_results.main(['--metric-name', 'psnr', csv1, csv2])
  out = capsys.readouterr().out
  assert '31.00' in out
  assert '29.00' in out


def test_summarize_order_filter_noname(tmp_path, capsys):
  """Reference flag parity: --order picks/reorders groups by key substring,
  --filter EXCLUDES matching groups, --no-name drops leading names
  (reference summarize_results.py:21-44,238-253)."""
  import summarize_results
  import pandas as pd
  for name, base in (('runA', 30.0), ('runB', 28.0), ('runC', 26.0)):
    pd.DataFrame({'psnr': [base, base + 1.0]}).to_csv(
        str(tmp_path / 'scarseg_{}_2020.csv'.format(name)))
  csvs = sorted(str(p) for p in tmp_path.glob('*.csv'))

  summarize_results.main(['--metric-name', 'psnr', '-o', 'runC,runA'] + csvs)
  out = capsys.readouterr().out
  lines = [l for l in out.splitlines() if 'run' in l]
  assert lines[0].startswith('runC') and lines[1].startswith('runA')
  assert not any('runB' in l for l in lines)

  summarize_results.main(['--metric-name', 'psnr', '-f', 'runB'] + csvs)
  out = capsys.readouterr().out
  assert 'runB' not in out and 'runA' in out and 'runC' in out

  summarize_results.main(['--metric-name', 'psnr', '--no-name'] + csvs)
  out = capsys.readouterr().out
  assert 'runA' not in out and '30.50' in out

  summarize_results.main(['--metric-name', 'psnr', '-v'] + csvs)
  out = capsys.readouterr().out
  assert 'Available columns' in out and 'runA:' in out


def test_average_dice_metric_via_registry():
  from csmri_refinement_tpu.metrics import get_metric_fn
  conf = Configuration.from_dict({
      'application': 'segmentation',
      'dice_metric': {'num_classes': 2, 'exclude_background': True}})
  fn = get_metric_fn(conf, 'dice', 'test')
  pred = np.zeros((1, 4, 4, 2), np.float32)
  pred[..., 1] = 1.0  # logits favoring class 1
  target = np.ones((1, 4, 4), np.int64)
  metric = fn(pred, target)
  assert metric.value == 1.0


def test_metric_key_overrides():
  """Per-metric pred_key/target_key/transform overrides
  (reference metrics/__init__.py:181-194)."""
  from csmri_refinement_tpu.metrics import get_metric_fn
  conf = Configuration.from_dict({
      'application': 'reconstruction',
      'psnr_metric': {'pred_key': 'pretrained', 'transform': 'none'}})
  fn = get_metric_fn(conf, 'psnr', 'test')
  x = np.random.RandomState(0).rand(1, 4, 4, 1).astype(np.float32)
  out = {'pred': np.zeros_like(x), 'pretrained': x}
  metric = fn(out, {'target': x})
  assert metric.value > 100  # identical → huge psnr


def test_summarize_api_grouping_sis_and_significance(tmp_path):
  """The rewritten summarizer: repeat-run grouping, SIS normalization by
  REC_DICE_GT, and pairwise Wilcoxon significance."""
  import summarize_results as sr
  import pandas as pd

  rng = np.random.RandomState(0)
  paths = []
  for name, off in [('base', 0.0), ('ours', 2.0)]:
    for date in ('20200101', '20200102'):
      p = str(tmp_path / 'scarseg_{}_{}.csv'.format(name, date))
      pd.DataFrame({'psnr': 30 + off + rng.randn(30) * 0.2,
                    'segscore': 0.75 + off / 100 +
                    rng.randn(30) * 1e-4}).to_csv(p, index=False)
      paths.append(p)

  table = sr.summarize(paths, 'psnr', stest_mode='wilcoxon')
  # repeats grouped; two-group comparisons append a difference row
  assert list(table.index) == ['base', 'ours', 'diff']
  groups = table.loc[['base', 'ours']]
  assert (groups['n_runs'] == 2).all()
  assert abs(table.loc['ours', 'mean'] - table.loc['base', 'mean'] - 2.0) \
      < 0.2
  np.testing.assert_allclose(
      table.loc['diff', 'mean'],
      table.loc['base', 'mean'] - table.loc['ours', 'mean'], atol=1e-9)
  assert groups['significant'].all()  # clearly separated groups

  sis = sr.summarize(paths, 'segscore')
  np.testing.assert_allclose(sis.loc['base', 'mean'],
                             0.75 / sr.REC_DICE_GT, atol=1e-4)
  np.testing.assert_allclose(sis.loc['ours', 'mean'],
                             0.77 / sr.REC_DICE_GT, atol=1e-4)
  assert sis.loc['base', 'std'] > 0  # std scales, not zeroed

  latex = sr.format_table(table, 'psnr', fmt='latex')
  assert r'\mathbf' in latex and 'ours' in latex


def test_eval_results_cli_end_to_end(tmp_path, capsys):
  """Full offline-eval chain: saved raw .mat reconstructions + fabricated
  ScarSeg GT labels → eval_results.py CSV/txt → summarize_results on the
  CSV (reference chain: validate.py --raw → scar_seg/eval.py →
  summarize_results.py)."""
  import struct
  import eval_results
  import summarize_results as sr
  from csmri_refinement_tpu.data import io_mat
  from csmri_refinement_tpu.data.datasets import (STATIC_SPLIT, _LABEL_PATH,
                                                  SliceDataset)

  rng = np.random.RandomState(0)
  n_slices, size = 2, 16

  # Fabricate the ScarSeg tree: every val case needs a label volume
  src = tmp_path / 'scarseg'
  label = (rng.rand(size, size, n_slices) > 0.7).astype(np.int16)
  header = bytearray(348)
  struct.pack_into('<i', header, 0, 348)
  struct.pack_into('<8h', header, 40, 3, size, size, n_slices, 0, 0, 0, 0)
  struct.pack_into('<h', header, 70, 4)   # int16
  struct.pack_into('<f', header, 112, 1.0)
  for case in STATIC_SPLIT['val']:
    base = src / case / os.path.dirname(_LABEL_PATH)
    base.mkdir(parents=True)
    img = str(src / case / _LABEL_PATH)
    with open(img[:-4] + '.hdr', 'wb') as f:
      f.write(header)
    with open(img, 'wb') as f:
      f.write(label.tobytes(order='F'))

  # Saved reconstructions for one val case
  class FakeDS:
    get_case_and_slice = staticmethod(SliceDataset.get_case_and_slice)

  results = tmp_path / 'results_run1'
  results.mkdir()
  case = STATIC_SPLIT['val'][0]
  for s in range(n_slices):
    target = rng.rand(1, size, size, 2).astype(np.float32)
    pred = target + 0.01 * rng.randn(1, size, size, 2).astype(np.float32)
    name = '{}_slice{:02d}'.format(case, s)
    io_mat.save_raw(str(results / (name + '.mat')), name,
                    target, pred, target, FakeDS())

  out = tmp_path / 'out'
  out.mkdir()
  eval_results.main(['--fold', 'val', '--src-path', str(src),
                     '--results-path', str(out), str(results)])
  capsys.readouterr()

  csv_path = out / 'scarseg_results_run1.csv'
  txt_path = out / 'scarseg_results_run1.txt'
  assert csv_path.exists() and txt_path.exists()
  import pandas as pd
  df = pd.read_csv(str(csv_path))
  assert len(df) == n_slices
  assert set(['psnr', 'ssim', 'name']) <= set(df.columns)
  assert (df['psnr'] > 20).all()       # pred ≈ target
  assert (df['ssim'] > 0.8).all()
  assert 'PSNR' in txt_path.read_text()

  # The rewritten summarizer consumes the produced CSV directly
  table = sr.summarize([str(csv_path)], 'psnr')
  assert len(table) == 1
  assert table.iloc[0]['mean'] > 20


def test_segmentation_score_registry_defaults(seg_checkpoint):
  """segmentation_score defaults to target_key=label / transform=none —
  the ergonomic path a reference user expects (no per-metric overrides)."""
  conf, _, _, _, ckpt_path = seg_checkpoint
  rec_conf = Configuration.from_dict({
      'seed': 0,
      'train_dataset': 'Synthetic', 'validation_dataset': 'Synthetic',
      'synthetic': {'image_size': 32, 'num_train': 8, 'num_val': 4},
      'include_labels': True,
      'undersampling': {'sampling_scheme': 'varden',
                        'acceleration_factor': 2},
      'runner_type': 'standard', 'application': 'reconstruction',
      'model': {'name': 'RecNet', 'num_blocks': 1, 'num_convs': 2,
                'num_filters': 4},
      'loss_name': 'MSE',
      'optimizer': {'name': 'Adam', 'learning_rate': 0.001},
      'batch_size': 4,
      'validation_metrics': ['psnr', 'segmentation_score'],
      'segmentation_score_metric': {
          'model': dict(conf.model, pretrained_weights=[ckpt_path, 'model']),
          'class': 1,
      },
  })
  runner = build_runner(rec_conf, 'standard', 'train')
  val_set = load_dataset(rec_conf, '/tmp', 'Synthetic', 'val')
  loader = DataLoader(val_set, 2)
  _, _, val_metrics = runner.validate(loader)
  assert 'segmentation_score' in val_metrics
  assert 0.0 <= val_metrics['segmentation_score'].value <= 1.0
