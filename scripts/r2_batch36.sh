#!/bin/bash
# Round-2 thirty-sixth batch: NN-descent routing diagnosis 2 (forced
# entry / level0-only / nndRandom=32 arms). Usage: r2_batch36.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b36_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_diag2.py 5400
echo "=== batch36 complete ($(date +%H:%M:%S)) ==="
