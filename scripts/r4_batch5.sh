#!/bin/bash
# Round-4 TPU batch 5: waits for batch 4 (pass its bash PID as $1).
set -u
cd /root/repo
R=bench_results
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 10
fi
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batch5.log
  timeout 5400 "$@" >> $R/r4_b5_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batch5.log
}
run taat1m python scripts/r4_sparse.py taat 1000000
run bench  python bench.py
echo "=== batch5 done ($(date +%H:%M:%S))" | tee -a $R/r4_batch5.log
