#!/bin/bash
# Round-2 ninth batch: everything gated on the scatter-hint fix
# (commit 958dea3). Waits for batch8 (dense 1M + beam backlog) to
# release the chip, then re-runs the sparse quality question with
# correct densify tables: base + base200 builds (does the fixed JL
# sketch close the 0.74-vs-0.93 recall gap?), the scan-speed
# attribution (incl. the blocked-MXU-vs-gather correctness check that
# could re-open a ~6x exact-scan path), and finally the big config.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if [ -f /tmp/r2_batch8.pid ]; then
  p=$(cat /tmp/r2_batch8.pid)
  while kill -0 "$p" 2>/dev/null; do sleep 60; done
fi

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python "$@" > "/tmp/r2_${name}.log" 2>&1
  local rc=$?
  tail -3 "/tmp/r2_${name}.log"
  echo "=== $name done rc=$rc ($(date +%H:%M:%S)) ==="
}

run squal_base2   5400 scripts/r2_sparse_quality.py base
run sscan_speed   3000 scripts/r2_sparse_scan_speed.py
run squal_b200    7200 scripts/r2_sparse_quality.py base200
run squal_big2    9000 scripts/r2_sparse_quality.py big
echo "ALL DONE $(date)"
