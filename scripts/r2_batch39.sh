#!/bin/bash
# Round-2 thirty-ninth batch: the NN-descent scale re-measures on the
# two batch37 crash fixes (host-BFS reachability — the device
# scatter-max fixpoint faulted the worker at 1M/1.2M; wide-row
# store-free descent — the 6.6 GB replicated store OOMed the sparse
# sketch build), all under the persistent jit cache (probed working
# over the relay, r2_jitcache.jsonl). Stages:
#   300k  — cold-cache 300k confirm (populates the executable cache),
#   300k  — again in a NEW process: the warm-persistent-cache build
#           wall (the production cold-start story),
#   300kprof — phase attribution (profiled, serialized-dispatch upper
#           bounds: init/descent/final/link/polish split),
#   1m    — the construction-headline attempt (wave anchor now 593 s,
#           batch38; reference 231 s/core),
#   glove — GloVe-1.2M cosine,
#   sparse — 100k sparse sketch-proxy NND (wide-row path).
# Usage: r2_batch39.sh [WAIT_PID].
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
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b39_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nnd_build.py 5400 300k
run r2_nnd_build.py 5400 300k
run r2_nnd_build.py 5400 300kprof
run r2_nnd_build.py 10800 1m
run r2_nnd_more.py 10800 glove
run r2_nnd_more.py 7200 sparse
echo "=== batch39 complete ($(date +%H:%M:%S)) ==="
