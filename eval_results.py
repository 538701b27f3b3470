#!/usr/bin/env python
"""Offline evaluation of saved reconstructions.

Rebuild of /root/reference/data/reconstruction/scar_seg/eval.py:54-91
(including the fix for its latent metrics-list syntax error, SURVEY.md §7):
loads saved .mat reconstructions + GT labels and computes per-slice
PSNR/SSIM/SegScore into CSV/txt summaries.
"""

import argparse
import os
import sys
from functools import partial

import numpy as np
import pandas as pd

from csmri_refinement_tpu.data.io_mat import CASE_KEY
from csmri_refinement_tpu.data.results_io import (add_gt_labels,
                                                  load_results_dataset)
from csmri_refinement_tpu.data.statistics import (compute_psnr,
                                                  compute_seg_score,
                                                  compute_ssim)
from csmri_refinement_tpu.utils.config import Configuration

parser = argparse.ArgumentParser(
    description='Offline eval of saved reconstruction results')
parser.add_argument('--fold', choices=['val', 'test'], default='val')
parser.add_argument('--src-path', default='resources/data/scar_segmentation',
                    help='Path to the ScarSeg dataset (for GT labels)')
parser.add_argument('--results-path', default='.',
                    help='Where to write csv/txt outputs')
parser.add_argument('--segscore-conf',
                    help='JSON config with segmentation_score_metric entry')
parser.add_argument('--data-format', default='default',
                    choices=['default', 'jo'])
parser.add_argument('--pred-key', default=None,
                    help='Prediction key for jo-format inputs')
parser.add_argument('--platform', default=None, choices=['cpu', 'tpu'])
parser.add_argument('input', help='Directory of saved .mat results')


def get_seg_score_obj(segscore_conf_path):
  from csmri_refinement_tpu.metrics.segmentation_score import (
      SegmentationScore)
  conf = Configuration.from_json(segscore_conf_path)
  metric_conf = conf.segmentation_score_metric
  model_conf = Configuration.from_dict(metric_conf['model'], conf)
  return SegmentationScore(
      model_conf, conf.file, class_idx=metric_conf.get('class', 1),
      skip_empty_images=metric_conf.get('skip_empty_images', False))


def main(argv):
  args = parser.parse_args(argv)
  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  dataset = load_results_dataset(args.input,
                                 data_format=args.data_format,
                                 pred_key=args.pred_key)
  dataset = add_gt_labels(dataset, args.src_path, args.fold)
  dataset = list(dataset.slice_iter())

  metrics = [('PSNR', 'psnr', compute_psnr),
             ('SSIM', 'ssim', compute_ssim)]
  if args.segscore_conf:
    seg_score = get_seg_score_obj(args.segscore_conf)
    metrics.append(('SegScore', 'segscore',
                    partial(compute_seg_score, seg_score=seg_score)))

  out_str = ''
  metric_dfs = []
  for name, metric_id, metric_fn in metrics:
    df = metric_fn(dataset).to_frame(metric_id)
    metric_dfs.append(df)
    s = '{}:\n{:.4f} +- {:.4f}\n'.format(name, np.mean(df[metric_id]),
                                         np.std(df[metric_id]))
    print(s)
    out_str += s + '\n'

  names = pd.Series([data[CASE_KEY] for data in dataset], name='name')
  df = metric_dfs[0].join([names] + metric_dfs[1:])

  base = os.path.basename(os.path.normpath(args.input))
  df.to_csv(os.path.join(args.results_path,
                         'scarseg_{}.csv'.format(base)), sep=',')
  with open(os.path.join(args.results_path,
                         'scarseg_{}.txt'.format(base)), 'w') as f:
    f.write(out_str)


if __name__ == '__main__':
  main(sys.argv[1:])
