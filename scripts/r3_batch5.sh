#!/bin/bash
# Round-3 fifth batch: clean re-run of the reference sparse-1M baseline
# with the machine otherwise idle (the first run was contended by the
# builder and its walls are caveated in BASELINE.md).
set -u
cd "$(dirname "$0")/.."
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 30
fi
echo "=== clean ref sparse 1M start ($(date +%H:%M:%S)) ===" >> bench_results/ref_sparse1m_clean.log
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_DATA_CACHE="$PWD/.datacache"
python scripts/ref_baseline/run_sparse.py 1000000 100 16 60000 \
  >> bench_results/ref_sparse1m_clean.log 2>&1
echo "=== clean ref sparse 1M done rc=$? ($(date +%H:%M:%S)) ===" >> bench_results/ref_sparse1m_clean.log
