#!/bin/bash
# Round-2 fifteenth batch: HNSW traversal profiling (dense low-ef beam,
# sparse exact traversal). Waits for batch14 (the sparse quality matrix)
# to release the chip first.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch14.pid ]; then
  while kill -0 "$(cat /tmp/batch14.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 60
run() {
  echo "=== $1 ($(date +%H:%M:%S)) ==="
  timeout "$2" python scripts/r2_traversal_prof.py "$1" > "/tmp/r2_travprof_$1.log" 2>&1
  echo "=== $1 done rc=$? ($(date +%H:%M:%S)) ==="
}
run dense 2400
sleep 30
run sparse 3600
