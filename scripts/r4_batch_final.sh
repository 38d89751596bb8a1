#!/bin/bash
# Round-4 final sequential TPU runner (replaces the stalled PID chain).
set -u
cd /root/repo
R=bench_results
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batchF.log
  timeout 5400 "$@" >> $R/r4_bF_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batchF.log
}
run bigbatch  python scripts/r4_sscan_bigbatch.py
run taat1m    python scripts/r4_sparse.py taat 1000000
run buildprof2 python scripts/r4_buildprof.py
run waveprof2 python scripts/r4_sparse.py waveprof
run bench     python bench.py
echo "=== batchF done ($(date +%H:%M:%S))" | tee -a $R/r4_batchF.log
