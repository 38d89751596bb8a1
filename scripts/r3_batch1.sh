#!/bin/bash
# Round-3 first batch: the sparse exact-wave probe (does the raw sparse
# wave program still fault the TPU worker post-scatter-hint-fix?) and
# the two decision NND measurements (GloVe cosine NND — the last lost
# build headline; 100k NND-vs-wave — the buildAlgo=auto threshold).
# Durable logs in bench_results/; datasets/golds in <repo>/.datacache.
# Usage: r3_batch1.sh [WAIT_PID]
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
  timeout "$2" python "scripts/$1" ${3:-} > "bench_results/r3_b1_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r3_sparse.py 7200 probe
run r3_sparse.py 7200 repair
run r3_nnd.py 10800 glove
run r3_nnd.py 7200 100k
echo "=== batch1 complete ($(date +%H:%M:%S)) ==="
