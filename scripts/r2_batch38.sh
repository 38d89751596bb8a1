#!/bin/bash
# Round-2 thirty-eighth batch (chained behind batch37): the persistent
# jit-cache probe (does jax_compilation_cache_dir work over the axon
# remote-compile relay? ~490 s/process of re-compile rides on it) and
# the 1M wave-build constructionExpand same-process A/B (4 vs 16: the
# 300k tune said 4 is 15% faster, the 1M confirm measured 1,994.9 s —
# unresolved reversal, see BASELINE "Build wall-clock correction").
# Usage: r2_batch38.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b38_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_jitcache.py 1800
run r2_build_tune.py 9000 expand1m
echo "=== batch38 complete ($(date +%H:%M:%S)) ==="
