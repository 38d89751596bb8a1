#!/bin/bash
# Round-2 sixth batch: everything after the densify-UB fix (c169090).
# The pre-fix squal_big run was killed on purpose — sparse quality and
# scan numbers must be measured on post-fix code, since the scatter UB
# plausibly corrupted exact-refinement pair scores on TPU (the 0.74
# recall mystery). Order: diag3 validates the fix hypothesis first,
# then quality, then the dense 1M configs, then the beam sweep.
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

run sdiag3     1800 scripts/r2_sparse_scan_diag3.py
run squal_scan 2700 scripts/r2_sparse_quality.py scan
run squal_big  7200 scripts/r2_sparse_quality.py big
run nbrstore2  5400 scripts/r2_nbrstore_1m.py
run beamx      4500 scripts/r2_beam_expand.py
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
echo "ALL DONE $(date)"
