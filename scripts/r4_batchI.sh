#!/bin/bash
# Round-4 batch I: mxu control for the 100k exact-wave recall delta,
# then a final warm bench (last TPU action of the round).
set -u
cd /root/repo
R=bench_results
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batchI.log
  timeout 4800 "$@" >> $R/r4_bI_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batchI.log
}
run probe100k_mxu python scripts/r4_sparse.py probe100k mxu
run bench python bench.py
echo "=== batchI done ($(date +%H:%M:%S))" | tee -a $R/r4_batchI.log
