#!/bin/bash
# Round-2 seventeenth batch: wall-overhead attribution (the dense ef=20
# batch executes in ~30 ms on device but walls at ~190 ms — name the
# round trips before building the packed-qenc fix).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch16.pid ]; then
  while kill -0 "$(cat /tmp/batch16.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
echo "=== wall probe ($(date +%H:%M:%S)) ==="
timeout 3000 python scripts/r2_wall_probe.py > /tmp/r2_wall_probe.log 2>&1
echo "=== done rc=$? ($(date +%H:%M:%S)) ==="
