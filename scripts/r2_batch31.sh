#!/bin/bash
# Round-2 thirty-first batch (supersedes batch30): NN-descent build
# measurements first (the new construction path — informs defaults and
# the 1M headline), then the requeued sparse-HNSW 1M row (killed at
# wave 292/977: CPU contention + the 2h timeout could not fit the
# ~100-min build; 3h here), then the batch29 casualties (both now
# regenerate wiped golds). Usage: r2_batch31.sh [WAIT_PID].
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b31_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_build.py 3600 300k
run r2_nnd_build.py 7200 tune
run r2_sparse_hnsw_1m.py 10800
run r2_nnd_build.py 7200 1m
run r2_build1m_confirm.py 7200
run r2_sparse_1m.py 4800 napp
echo "=== batch31 complete ($(date +%H:%M:%S)) ==="
