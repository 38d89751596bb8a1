#!/bin/bash
# Round-2 twenty-third batch — bench.py headline refresh on the shipped
# group-min kernel defaults (the 60.4k-qps exact-scan row predates
# KERNEL_LAYOUT="x"/tq=512) + sparse NAPP 1M query attribution (81 qps
# vs the scan's 401 — index slower than brute force at scale).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch22.pid ]; then
  while kill -0 "$(cat /tmp/batch22.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b23_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
echo "=== bench.py ($(date +%H:%M:%S)) ==="
timeout 3000 python bench.py > /tmp/r2_b23_bench.log 2>&1
echo "=== bench.py done rc=$? ($(date +%H:%M:%S)) ==="
sleep 30
run r2_napp_prof.py 3000
