#!/bin/bash
# Round-4 TPU batch 1 — chained, one process at a time (CLAUDE.md: the
# tunnel + single CPU core punish concurrency). Order = VERDICT value.
cd /root/repo
R=bench_results
mkdir -p $R
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batch1.log
  timeout 5400 "$@" >> $R/r4_b1_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batch1.log
}
run taat     python scripts/r4_sparse.py taat
run napp1m   python scripts/r4_sparse.py napp1m
run shrink   python scripts/r4_sparse.py shrink
run tree     python scripts/r4_tree.py all
run waveprof python scripts/r4_sparse.py waveprof
run bench    python bench.py
echo "=== batch1 done ($(date +%H:%M:%S))" | tee -a $R/r4_batch1.log
