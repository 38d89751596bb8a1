#!/bin/bash
# Round-2 twenty-fourth batch — vptree gathered-traversal fine sweep
# (alpha refinement around 4 + the ml=512 high-recall end).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch23.pid ]; then
  while kill -0 "$(cat /tmp/batch23.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
echo "=== r2_vptree_gather.py fine ($(date +%H:%M:%S)) ==="
timeout 5400 python scripts/r2_vptree_gather.py fine > /tmp/r2_b24_vpg_fine.log 2>&1
echo "=== r2_vptree_gather.py fine done rc=$? ($(date +%H:%M:%S)) ==="
