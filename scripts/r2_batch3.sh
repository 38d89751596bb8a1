#!/bin/bash
# Round-2 third TPU batch: waits for batch2 (pid file) to finish, then
# runs the deep sparse-block diagnosis, the full group-min matrix
# (padded corpus + XLA grouped-min probes), and the nbrstore 1M rerun
# with the quantize-before-gather fix.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if [ -f /tmp/r2_batch2.pid ]; then
  while kill -0 "$(cat /tmp/r2_batch2.pid)" 2>/dev/null; do sleep 60; done
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python "$@" > "/tmp/r2_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r2_${name}.log"
  echo "=== $name done rc=$rc ($(date +%H:%M:%S)) ==="
}

run sdiag2     1800 scripts/r2_sparse_scan_diag2.py
run groupmin3  9000 scripts/r2_groupmin_rest.py
run nbrstore2  5400 scripts/r2_nbrstore_1m.py
echo "ALL DONE $(date)"
