#!/bin/bash
# Round-2 forty-first batch: the construction neighbor store A/B
# (constructionStore=1 — level-0 construction beam on int8 granule
# gathers, incrementally maintained across waves). 300k triple first
# (cs0/cs1/cs1-repeat bounds drift; ~209 s anchor), then the 1M pair
# (~593 s anchor). Quality bar: ef=20 recall within noise of cs0.
# Usage: r2_batch41.sh [WAIT_PID]
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
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b41_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_cstore.py 3600 300k
run r2_cstore.py 5400 1m
echo "=== batch41 complete ($(date +%H:%M:%S)) ==="
