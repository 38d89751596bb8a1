#!/bin/bash
# Round-2 twenty-first batch — the vptree gathered-traversal Pareto at
# 1M (chained behind batch20's re-measures).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch20.pid ]; then
  while kill -0 "$(cat /tmp/batch20.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b21_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_vptree_gather.py 5400
