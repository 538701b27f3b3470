#!/usr/bin/env python
"""Aggregate bench_variance.sh headlines into median ± spread (no jax).

Usage: python scripts/bench_variance_stats.py [/tmp/bench_variance]
Prints one markdown table row per run plus median / min / max / spread%
for the 256^2 headline and the 512^2 extra row.
"""

import glob
import json
import os
import re
import sys


def main(outdir):
  runs = []
  for path in sorted(glob.glob(os.path.join(outdir, 'run*.stdout')),
                     key=lambda p: int(re.search(r'run(\d+)', p).group(1))):
    i = int(re.search(r'run(\d+)', path).group(1))
    headline = extra512 = None
    line = open(path).read().strip()
    if line:
      headline = json.loads(line)
    err = path[:-len('.stdout')] + '.stderr'
    if os.path.exists(err):
      for ln in open(err):
        if ln.startswith('extra: ') and '512x512' in ln:
          try:
            extra512 = json.loads(ln[len('extra: '):])
          except ValueError:
            pass
    runs.append((i, headline, extra512))

  vals256, vals512 = [], []
  print('| run | 256² slices/s | vs_baseline | 512² slices/s |')
  print('|---|---|---|---|')
  for i, h, e in runs:
    v256 = h.get('value') if h else None
    vb = h.get('vs_baseline') if h else None
    v512 = e.get('value') if e else None
    if isinstance(v256, (int, float)):
      vals256.append(v256)
    if isinstance(v512, (int, float)):
      vals512.append(v512)
    print('| %d | %s | %s | %s |' % (i, v256, vb, v512))

  for name, vals in (('256^2', vals256), ('512^2', vals512)):
    if not vals:
      continue
    s = sorted(vals)
    n = len(s)
    med = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
    spread = 100.0 * (s[-1] - s[0]) / med
    print('%s: median %.1f  min %.1f  max %.1f  spread %.1f%%  (n=%d)'
          % (name, med, s[0], s[-1], spread, n))


if __name__ == '__main__':
  main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/bench_variance')
