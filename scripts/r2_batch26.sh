#!/bin/bash
# Round-2 twenty-sixth batch —
#   1. NAPP re-measure on the MXU ScanCount (1M sparse was 81 qps on
#      the gather backend; 1M dense was 676).
#   2. sparse HNSW at 1M: the first sparse-ANN scale row beyond 100k
#      (sketch-proxy + exactPairs-MXU build; ~90 min estimated from the
#      100k build's 530-600 s x10 waves).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch25.pid ]; then
  while kill -0 "$(cat /tmp/batch25.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b26_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_sparse_1m.py 2400 napp
run r2_tree_1m.py 3600 napp
run r2_sparse_hnsw_1m.py 9000
