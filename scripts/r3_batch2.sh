#!/bin/bash
# Round-3 second batch: sparse scan formulation A/B (100k + 1M), range
# at 1M on chip, u8 1M NND, the 1M sparse build (arm chosen from the
# batch1 repair/probe data), and a full bench.py (warms the driver's
# executable cache for the round-end run).
# Usage: r3_batch2.sh [WAIT_PID]
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
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "bench_results/r3_b2_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r3_sparse_scan.py 7200 100000
run r3_sparse_scan.py 7200 1000000
run r3_range.py 7200
run r3_nnd.py 10800 u8
run r3_nnd.py 10800 glove
echo "=== bench ($(date +%H:%M:%S)) ==="
timeout 7200 python bench.py > bench_results/r3_b2_bench.json 2>bench_results/r3_b2_bench.log
echo "=== bench done rc=$? ($(date +%H:%M:%S)) ==="
echo "=== batch2 complete ($(date +%H:%M:%S)) ==="
