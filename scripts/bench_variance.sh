#!/bin/bash
# Variance protocol for the official bench (VERDICT r4 #3): run N fresh
# bench.py processes back-to-back, each its own relay client, and collect
# the headline JSON lines. One jax process at a time (CLAUDE.md rule) —
# this script is strictly sequential.
#
# Usage: bash scripts/bench_variance.sh [N] [OUTDIR]
set -u
N="${1:-5}"
OUT="${2:-/tmp/bench_variance}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N"); do
  echo "=== run $i/$N $(date -u +%H:%M:%S) ===" >&2
  timeout 900 python bench.py >"$OUT/run$i.stdout" 2>"$OUT/run$i.stderr"
  rc=$?
  echo "run$i rc=$rc headline: $(cat "$OUT/run$i.stdout")" >&2
done
echo "--- headlines ---"
for i in $(seq 1 "$N"); do
  printf 'run%d\t%s\n' "$i" "$(cat "$OUT/run$i.stdout")"
done
