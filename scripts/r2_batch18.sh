#!/bin/bash
# Round-2 eighteenth batch: 1M range re-run (the first run died on a
# script API typo after computing radii — now through the real
# range_query_batch API), then the packed-vs-eager query transport A/B
# on the chip (dense 100k hnsw + sparse 100k hnsw wall qps).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch17.pid ]; then
  while kill -0 "$(cat /tmp/batch17.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
echo "=== range_1m ($(date +%H:%M:%S)) ==="
timeout 2400 python scripts/r2_range_1m.py > /tmp/r2_b18_range.log 2>&1
echo "=== range_1m done rc=$? ($(date +%H:%M:%S)) ==="
sleep 30
echo "=== qpack A/B ($(date +%H:%M:%S)) ==="
timeout 3600 python scripts/r2_qpack_ab.py > /tmp/r2_b18_qpack.log 2>&1
echo "=== qpack A/B done rc=$? ($(date +%H:%M:%S)) ==="
