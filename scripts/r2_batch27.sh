#!/bin/bash
# Round-2 twenty-seventh batch — exact-scan pass-1 tier A/B on the new
# kernel + 1M build confirm at constructionExpand=4.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch26.pid ]; then
  while kill -0 "$(cat /tmp/batch26.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b27_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_scan_tier.py 2400
run r2_build1m_confirm.py 3600
