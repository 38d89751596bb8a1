#!/bin/bash
# Round-4 TPU batch 4: waits for batch 3 (pass its bash PID as $1).
set -u
cd /root/repo
R=bench_results
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 10
fi
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batch4.log
  timeout 5400 "$@" >> $R/r4_b4_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batch4.log
}
run waveprof2 python scripts/r4_sparse.py waveprof
run bench     python bench.py
echo "=== batch4 done ($(date +%H:%M:%S))" | tee -a $R/r4_batch4.log
