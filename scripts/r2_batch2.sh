#!/bin/bash
# Round-2 TPU remainder batch (after the first batch's fixes): the
# sparse-scan divergence diagnostic first (cheap, decides whether a
# correctness fix must land this round), then the resumable group-min
# kernel hunt (flagship bench decision), then the 1M configs.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python "$@" > "/tmp/r2_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r2_${name}.log"
  echo "=== $name done rc=$rc ($(date +%H:%M:%S)) ==="
}

run sdiag      1800 scripts/r2_sparse_scan_diag.py
run groupmin2  7200 scripts/r2_groupmin_rest.py
run nbrstore   5400 scripts/r2_nbrstore_1m.py
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
run squal_big  7200 scripts/r2_sparse_quality.py big
echo "ALL DONE $(date)"
