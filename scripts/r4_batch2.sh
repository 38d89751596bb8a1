#!/bin/bash
# Round-4 TPU batch 2: waits for batch 1 (pass its bash PID as $1), then
# re-runs the TAAT stage (OOM at nq=512 fixed: block-sliced scatter-add
# scan) and the 1M NND cold-process build attribution.
set -u
cd /root/repo
R=bench_results
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 10
fi
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batch2.log
  timeout 5400 "$@" >> $R/r4_b2_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batch2.log
}
run taat      python scripts/r4_sparse.py taat
run buildprof python scripts/r4_buildprof.py
run bench     python bench.py
echo "=== batch2 done ($(date +%H:%M:%S))" | tee -a $R/r4_batch2.log
