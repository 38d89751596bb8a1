#!/bin/bash
# Round-3 third batch: re-measure the sparse repair A/B with the
# merge-forward fix (replace semantics collapsed hub in-degree), the
# fixed u8 1M NND stage, then the 1M sparse arm at shipped defaults
# (proxy build + exactPost merge repair).
# Usage: r3_batch3.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_JIT_CACHE="$PWD/.jaxcache"
export TPU_KNN_DATA_CACHE="$PWD/.datacache"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 30
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "bench_results/r3_b3_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r3_sparse.py 10800 repair
run r3_nnd.py 10800 u8
echo "=== batch3 complete ($(date +%H:%M:%S)) ==="
