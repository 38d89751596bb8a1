#!/bin/bash
# Round-2 thirteenth batch: the 100k exactPairs-on-MXU builds (batch12's
# base/base200 stages — its scan stage already ran and exposed the
# single-pass recall regression handled by r2_sscan_recall_bisect.py).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ==="
  timeout "$3" python scripts/r2_sparse_pairs_tpu.py "$1" > "/tmp/r2_spairs_$2.log" 2>&1
  echo "=== $1 done rc=$? ($(date +%H:%M:%S)) ==="
}
run base base 3600
sleep 120
run base200 b200 5400
