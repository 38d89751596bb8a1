#!/bin/bash
# Round-2 thirty-seventh batch: the NN-descent scale re-measures on the
# store-residency fix (the previous sweep's 8+ GB replicated store stayed
# referenced while the next one allocated — two resident stores OOMed the
# 1M/GloVe/sparse builds on sweep 2) + the beam-polish default (300k
# recall 0.86 -> 0.9717 @ ef=20, diag2). Stages:
#   300k confirm (polished build time + qps/recall sweep),
#   1M (the construction-headline attempt), GloVe-1.2M, sparse-100k.
# Usage: r2_batch37.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b37_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_build.py 5400 300k
run r2_nnd_build.py 10800 1m
run r2_nnd_more.py 10800 glove
run r2_nnd_more.py 7200 sparse
echo "=== batch37 complete ($(date +%H:%M:%S)) ==="
