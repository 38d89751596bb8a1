#!/bin/bash
# Round-2 tenth batch: sparse crash bisect (one variant per process;
# a worker crash poisons the client). 90s pause between variants gives
# the TPU worker time to restart after a fault. Then, if a surviving
# formulation emerged, the quality stages are re-run MANUALLY — this
# batch only gathers the attribution matrix.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" python "$@" > "/tmp/r2_${name}.log" 2>&1
  local rc=$?
  tail -2 "/tmp/r2_${name}.log"
  echo "=== $name done rc=$rc ($(date +%H:%M:%S)) ==="
  sleep 90
}

run scrash_phases 2400 scripts/r2_sparse_crash_bisect.py phases
run scrash_skg    2400 scripts/r2_sparse_crash_bisect.py sk_gather
run scrash_nop    2400 scripts/r2_sparse_crash_bisect.py no_pairs
run scrash_proxy  2400 scripts/r2_sparse_crash_bisect.py proxy_only
run scrash_densc  2400 scripts/r2_sparse_crash_bisect.py dens_c
echo "ALL DONE $(date)"
