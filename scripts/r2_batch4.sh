#!/bin/bash
# Round-2 fourth TPU batch: the VM rebooted mid-round, wiping /tmp
# (dataset cache, all pending r2_*.jsonl results) before batch 3 ran.
# This re-runs EVERYTHING still undecided, in decision order:
#   1. sdiag2      — sparse block-divergence structure (correctness)
#   2. groupmin3   — full group-min matrix incl. XLA grouped-min probes
#                    (flagship pass-1 decision; XLA rowmin ref measured
#                    86.6 TF/s vs the Pallas kernel's 41)
#   3. squal_big   — 100k sparse quality: exactPairs + efC=200 vs the
#                    0.74-recall round-1 number
#   4. nbrstore2   — 1M int8 neighbor store + ef=10/14 Pareto points
#   5. squal_scan  — sparse exact-scan qdense A/B qps
#   6. tree_vp/napp— 1M vptree + NAPP build/sweep rows
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

run sdiag2     1800 scripts/r2_sparse_scan_diag2.py
run groupmin3  7200 scripts/r2_groupmin_rest.py
run squal_big  7200 scripts/r2_sparse_quality.py big
run nbrstore2  5400 scripts/r2_nbrstore_1m.py
run squal_scan 2700 scripts/r2_sparse_quality.py scan
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
echo "ALL DONE $(date)"
