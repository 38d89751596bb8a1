#!/bin/bash
# Round-2 thirty-third batch: NN-descent reverse-link diagnosis + the
# shrink-mode fix A/B at 300k (in-degree stats, self-findability,
# held-out sweep). Usage: r2_batch33.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b33_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_diag.py 5400
echo "=== batch33 complete ($(date +%H:%M:%S)) ==="
