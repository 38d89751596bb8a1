#!/bin/bash
# Round-2 thirty-fourth batch: NN-descent beyond SIFT-l2 — GloVe-1.2M
# cosine and 100k sparse sketch-proxy builds. Usage: r2_batch34.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b34_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_more.py 7200 glove
run r2_nnd_more.py 5400 sparse
echo "=== batch34 complete ($(date +%H:%M:%S)) ==="
