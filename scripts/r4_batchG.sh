#!/bin/bash
# Round-4 batch G (run after batchF): pair-gram A/B + chunked bigbatch + final bench.
set -u
cd /root/repo
R=bench_results
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batchG.log
  timeout 4200 "$@" >> $R/r4_bG_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batchG.log
}
run pair_sup  python scripts/r4_sparse.py pairab support
run pair_mxu  python scripts/r4_sparse.py pairab mxu
run bigbatch1024 python scripts/r4_sscan_bigbatch.py 1024
run bench     python bench.py
echo "=== batchG done ($(date +%H:%M:%S))" | tee -a $R/r4_batchG.log
