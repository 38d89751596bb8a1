#!/bin/bash
# Round-3 fourth batch: vptree 1M Pareto on the pruner-ordered budget,
# range re-run (fixed f64 oracle band), sparse-scan chunk sweep at 1M.
# Usage: r3_batch4.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_JIT_CACHE="$PWD/.jaxcache"
export TPU_KNN_DATA_CACHE="$PWD/.datacache"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 30
fi
run() {
  echo "=== $1 ${3:-}${4:+ $4} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} ${4:-} > "bench_results/r3_b4_$(basename "$1" .py)_${3:-x}${4:+_$4}.log" 2>&1
  echo "=== $1 ${3:-}${4:+ $4} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
echo "=== bench-warm ($(date +%H:%M:%S)) ==="
timeout 7200 python bench.py > bench_results/r3_b4_bench.json 2>bench_results/r3_b4_bench.log
echo "=== bench-warm done rc=$? ($(date +%H:%M:%S)) ==="
run r3_tree.py 10800
run r3_range.py 7200
run r3_sparse_scan.py 7200 1000000 2048
run r3_sparse_scan.py 7200 1000000 4096
run r3_sparse.py 14400 exact1m
echo "=== batch4 complete ($(date +%H:%M:%S)) ==="
