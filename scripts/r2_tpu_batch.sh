#!/bin/bash
# Round-2 TPU measurement backlog, one command for when the tunnel is
# healthy. Runs each experiment in its own process (a worker fault in
# one must not kill the rest), bounded, logging to /tmp/r2_*.log.
# Order: value-per-minute — kernel layout decision first (it gates the
# flagship bench number), then beam-body A/B, sparse quality at 100k,
# sparse scan A/B, 1M tree methods, 1M int8 nbr-store.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python "$@" > "/tmp/r2_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r2_${name}.log"
  echo "=== $name done rc=$rc ==="
}

run groupmin   2400 scripts/r2_groupmin_layout.py
run beam       3600 scripts/r2_beam_modes.py
run squal_big  7200 scripts/r2_sparse_quality.py big
run squal_scan 3600 scripts/r2_sparse_quality.py scan
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
run nbrstore   5400 scripts/r2_nbrstore_1m.py
echo "ALL DONE $(date)"
