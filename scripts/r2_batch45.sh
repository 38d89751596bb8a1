#!/bin/bash
# Round-2 forty-fifth batch: flagship 1M dense rows in one process
# (constructionStore-default wave build at efC=64 vs efC=100, int8-store
# query sweeps), then the GloVe-1.2M NND retry on the host-chunked
# polish (batch42's glove arm was killed once the 1mprof run localized
# the fault to the fused polish sweep).
# Usage: r2_batch45.sh [WAIT_PID]
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
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b45_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_best1m.py 10800
run r2_nnd_more.py 10800 glove
echo "=== batch45 complete ($(date +%H:%M:%S)) ==="
