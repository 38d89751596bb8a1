#!/bin/bash
# Round-2 twelfth batch: the MXU exactPairs backend + single-pass sparse
# scan, measured on the chip. Stages run in separate processes (a worker
# crash kills the process; sleep between stages covers worker recovery).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ==="
  timeout "$3" python scripts/r2_sparse_pairs_tpu.py "$1" > "/tmp/r2_spairs_$2.log" 2>&1
  echo "=== $1 done rc=$? ($(date +%H:%M:%S)) ==="
}
run scan scan 2400
sleep 60
run base base 3600
sleep 120
run base200 b200 5400
