#!/bin/bash
# Round-2 thirty-second batch: the beam-body (dedup x merge) A/B that
# was queued in commit 1e8a461 but never reached the chip (VM restart
# wiped the queue), chained behind batch31. Usage: r2_batch32.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b32_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_beam_modes.py 4800
echo "=== batch32 complete ($(date +%H:%M:%S)) ==="
