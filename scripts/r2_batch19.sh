#!/bin/bash
# Round-2 nineteenth batch — headline re-measures with packed query
# transport + clean timing (both landed after the originals):
#   1. SIFT-1M int8-store sweep (the matched-recall fight vs the
#      reference's 17.9k qps/core @ 0.970).
#   2. sparse 100k quality build + sweep (support scoring + packed).
#   3. GloVe-1.2M cosine sweep.
#   4. sparse 1M scan + f64 spot-check, then NAPP at 1M (scale row).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch18.pid ]; then
  while kill -0 "$(cat /tmp/batch18.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b19_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_nbrstore_1m.py 4200
run r2_sparse_pairs_tpu.py 4800 base
run r2_glove_1m.py 3000
run r2_sparse_1m.py 3600 scan
run r2_sparse_1m.py 2400 napp
