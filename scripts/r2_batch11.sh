#!/bin/bash
# Round-2 eleventh batch: after the crash bisect, attribute the sparse
# exact-scan wall gap (652 qps wall vs ~10.3k device-core equivalent).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/r2_batch10.pid ]; then
  p=$(cat /tmp/r2_batch10.pid)
  while kill -0 "$p" 2>/dev/null; do sleep 60; done
fi
sleep 90
echo "=== sprof ($(date +%H:%M:%S)) ==="
timeout 3000 python scripts/r2_sparse_scan_profile.py > /tmp/r2_sprof.log 2>&1
echo "=== sprof done rc=$? ($(date +%H:%M:%S)) ==="
