#!/bin/bash
# Round-2 seventh batch: waits for the in-flight squal_big (pid file),
# then runs the FIXED diag3 (uint32 checksums + lax.map densify probe),
# the exact (non-proxy) sparse build stability retest, and the
# remaining dense 1M + beam measurements from the original backlog.
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
run sexact     5400 scripts/r2_sparse_exactbuild.py
run nbrstore2  5400 scripts/r2_nbrstore_1m.py
run beamx      4500 scripts/r2_beam_expand.py
run tree_vp    3600 scripts/r2_tree_1m.py vptree
run tree_napp  3600 scripts/r2_tree_1m.py napp
echo "ALL DONE $(date)"
