#!/bin/bash
# Round-2 fourteenth batch: the sparse 100k quality matrix against the
# CORRECTED f64 host gold (the old device gold predated the scatter-hint
# fix and was wrong on queries 135-155+271 — scripts/sparse_gold.py).
# scan is the exactness confirmation (expect 1.0); base/base200 are the
# exactPairs-on-MXU HNSW quality sweeps; napp is the ANN comparison row.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ==="
  timeout "$3" python scripts/r2_sparse_pairs_tpu.py "$1" > "/tmp/r2_spairs_$2.log" 2>&1
  echo "=== $1 done rc=$? ($(date +%H:%M:%S)) ==="
}
run scan scan2 1800
run napp napp 2400
sleep 60
run base base2 3600
sleep 120
run base200 b200 5400
