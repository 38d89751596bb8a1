#!/bin/bash
# Round-2 forty-sixth batch: the buildAlgo=auto decision data (100k
# NND-vs-wave same-process A/B at bench scale) and a fresh full
# bench.py run on the shipped defaults (constructionStore +
# nndPolishStore now default; executable cache warm from the A/B).
# Usage: r2_batch46.sh [WAIT_PID]
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
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b46_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_build.py 7200 100k
echo "=== bench ($(date +%H:%M:%S)) ==="
timeout 3600 python bench.py > /tmp/r2_b46_bench.json 2>/tmp/r2_b46_bench.log
echo "=== bench done rc=$? ($(date +%H:%M:%S)) ==="
echo "=== batch46 complete ($(date +%H:%M:%S)) ==="
