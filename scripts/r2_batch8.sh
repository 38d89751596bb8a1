#!/bin/bash
# Round-2 eighth batch: the scatter-variant matrix (diag4) gates every
# sparse quality number, so it goes first; then the sparse stages rerun
# on whatever fix lands (the driver after diag4 is interactive — this
# batch just runs the independent dense 1M + beam backlog afterwards).
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

run sdiag4     2400 scripts/r2_sparse_scan_diag4.py
run nbrstore2  5400 scripts/r2_nbrstore_1m.py
run beamx      4500 scripts/r2_beam_expand.py
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
echo "ALL DONE $(date)"
