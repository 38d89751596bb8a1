#!/bin/bash
# Round-2 twenty-fifth batch — synced constructionExpand/waveSize
# re-tune at 300k (the expand=16 default came from unsynced walls).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch24.pid ]; then
  while kill -0 "$(cat /tmp/batch24.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
echo "=== r2_build_tune.py ($(date +%H:%M:%S)) ==="
timeout 5400 python scripts/r2_build_tune.py > /tmp/r2_b25_btune.log 2>&1
echo "=== r2_build_tune.py done rc=$? ($(date +%H:%M:%S)) ==="
