#!/bin/bash
# Interleaved tree-vs-tree battery bench — the round-10 timing
# protocol (SCALING.md): on a host whose Spark throughput oscillates
# up to ~1.7x on tens-of-minutes timescales, the only attributable
# cross-tree statistic is the per-query MINIMUM across same-window
# interleaved reps.  This script runs OLD/NEW/OLD/NEW in one window
# and min-diffs them with tools/compare_bench.py.
#
# Usage: tools/bench_ab.sh /path/to/old-worktree [reps] [outdir]
#   old-worktree: `git worktree add /tmp/rNtree <round-close-commit>`
#   reps:         per-tree battery runs, default 2
#   outdir:       snapshot dir, default /tmp/bench_ab
#
# Run with the machine otherwise idle (uptime 1-min load < 1).
set -eu
OLD_TREE=$1
REPS=${2:-2}
OUT=${3:-/tmp/bench_ab}
NEW_TREE=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$OUT"
stamp() { date +%H:%M:%S; }
for rep in $(seq 1 "$REPS"); do
  echo "=== $(stamp) rep $rep: old tree ($OLD_TREE) ==="
  (cd "$OLD_TREE" && python bench.py >"$OUT/old_rep$rep.out" 2>"$OUT/old_rep$rep.err" \
     && cp BENCH_FULL.json "$OUT/old_rep$rep.json")
  echo "=== $(stamp) rep $rep: new tree ($NEW_TREE) ==="
  (cd "$NEW_TREE" && python bench.py >"$OUT/new_rep$rep.out" 2>"$OUT/new_rep$rep.err" \
     && cp BENCH_FULL.json "$OUT/new_rep$rep.json")
done
echo "=== $(stamp) done; min-of-reps diff (old -> new) ==="
OLDS=$(ls "$OUT"/old_rep*.json | paste -sd,)
NEWS=$(ls "$OUT"/new_rep*.json | paste -sd,)
python "$NEW_TREE/tools/compare_bench.py" "$OLDS" "$NEWS" || true
