#!/bin/bash
# Round-2 forty-fourth batch: the two round-end-queued measurements the
# VM restart wiped before they ever ran, plus the cstore recall re-check
# on the fixed gold slicing:
#   r2_beam_modes.py — VERDICT item 5: every (dedup, merge) beam-body
#     combination at 100k/ef=20+50, wall qps + per-op profiler traces.
#   r2_scan_tier.py  — pass-1 precision tiers ON the resolved group-min
#     kernel (f32 19.1 / bf16x3 11.4 ms moved the ratio materially).
#   r2_cstore.py 300k — recall columns were garbage (gold slicing);
#     re-measure quality bar for constructionStore at 300k.
# Usage: r2_batch44.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_JIT_CACHE=/root/.cache/tpu_knn/jaxcache
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b44_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_beam_modes.py 7200
run r2_scan_tier.py 5400
run r2_cstore.py 3600 300k
echo "=== batch44 complete ($(date +%H:%M:%S)) ==="
