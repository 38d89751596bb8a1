#!/bin/bash
# Round-2 forty-third batch: polish-store A/B (nndPolishStore) — the
# polish pass is ~35 s of the 165 s warm 300k NND build and its beam is
# granule-count-bound; int8 neighbor granules + exact re-score should
# cut it several-fold at unchanged recall (the wave-cstore safety
# argument at efConstruction=100). 1M pair only pays off if batch42
# fixed the 1M fault. Usage: r2_batch43.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_JIT_CACHE=/root/.cache/tpu_knn/jaxcache
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b43_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_polish_ab.py 7200 300k
run r2_polish_ab.py 10800 1m
echo "=== batch43 complete ($(date +%H:%M:%S)) ==="
