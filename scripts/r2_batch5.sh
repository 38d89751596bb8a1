#!/bin/bash
# Round-2 fifth batch: takes over from batch4 (driver killed to
# reprioritize; the in-flight squal_big python keeps running and this
# waits on its pid file). Order: the transfer-vs-compute sparse
# diagnostic FIRST (decides whether a correctness fix must land this
# round), then the remaining 1M measurements.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if [ -f /tmp/squal_big.pid ]; then
  while kill -0 "$(cat /tmp/squal_big.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python "$@" > "/tmp/r2_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r2_${name}.log"
  echo "=== $name done rc=$rc ($(date +%H:%M:%S)) ==="
}

run sdiag3     1800 scripts/r2_sparse_scan_diag3.py
run nbrstore2  5400 scripts/r2_nbrstore_1m.py
run squal_scan 2700 scripts/r2_sparse_quality.py scan
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
echo "ALL DONE $(date)"
