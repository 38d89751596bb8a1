#!/bin/bash
# Round-2 twenty-ninth batch — requeue of batch27/28 (lost to the VM
# reset before they ran: /tmp caches + logs wiped) plus the sparse
# HNSW 1M first-scale row. Order: dense-cache users first (scan tier,
# build confirm), then the sparse-1M users (napp re-measure, hnsw 1M,
# napp profile).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b29_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_scan_tier.py 2400
run r2_build1m_confirm.py 4800
run r2_sparse_1m.py 2400 napp
run r2_sparse_hnsw_1m.py 7200
run r2_napp_prof.py 3000
echo "=== batch29 complete ($(date +%H:%M:%S)) ==="
