#!/bin/bash
# Round-4 batch H: 100k exact-wave on the support pair-gram default
# (direct VERDICT item-5 done-criterion) + final cache-warm bench.
set -u
cd /root/repo
R=bench_results
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batchH.log
  timeout 4800 "$@" >> $R/r4_bH_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batchH.log
}
run exactwave100k python scripts/r4_sparse.py probe100k
run bench python bench.py
echo "=== batchH done ($(date +%H:%M:%S))" | tee -a $R/r4_batchH.log
