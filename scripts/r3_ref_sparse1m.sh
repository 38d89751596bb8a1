#!/bin/bash
# Reference sparse-1M baseline (VERDICT r2 item 5): nice'd, durable log,
# restartable. Waits for the ref build if a PID is given.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_DATA_CACHE="$PWD/.datacache"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== ref sparse 1M start ($(date +%H:%M:%S)) ===" >> bench_results/ref_sparse1m.log
nice -n 19 python scripts/ref_baseline/run_sparse.py 1000000 100 16 60000 \
  >> bench_results/ref_sparse1m.log 2>&1
echo "=== ref sparse 1M done rc=$? ($(date +%H:%M:%S)) ===" >> bench_results/ref_sparse1m.log
