#!/bin/bash
# Round-2 twenty-second batch — HNSW construction attribution (the one
# headline the reference still wins: 231 s/core vs our ~800 s at 1M).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch21.pid ]; then
  while kill -0 "$(cat /tmp/batch21.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b22_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_build_prof.py 3000
