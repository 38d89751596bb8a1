#!/bin/bash
# Round-2 forty-second batch: localize + fix the NND 1M worker fault.
# batch39's 1M build crashed the TPU worker with the fault surfacing at
# repair_reachability's adjacency download — i.e. in one of the async
# programs between the last synced descent sweep and that download
# (_exact_aug_sweep / _prune_sweep / _rev_nearest / _shrink_sweep).
# Code changes since: the gstart scatter-max in _make_b/_rev_nearest is
# now a lax.cummax (scatter-free), and prune_and_link grew profile-mode
# sub-phase syncs. Stages:
#   1mprof  — profiled 1M NND build: syncs after every phase and
#             sub-phase; either it passes (cummax was the fix) or the
#             crash names its phase.
#   1mslots — rev_mode=slots bypass arm (skips _rev_nearest+_shrink):
#             isolates the shrink path AND gives a 1M slots-mode row.
#   glove   — GloVe-1.2M NND retry on the fixed code.
# Usage: r2_batch42.sh [WAIT_PID]
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
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b42_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_build.py 10800 1mprof
run r2_nnd_build.py 10800 1mslots
run r2_nnd_more.py 10800 glove
echo "=== batch42 complete ($(date +%H:%M:%S)) ==="
