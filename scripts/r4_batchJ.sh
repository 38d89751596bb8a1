#!/bin/bash
# Round-4 batch J (last): ramp on/off A/B at 100k exact waves.
set -u
cd /root/repo
R=bench_results
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batchJ.log
  timeout 3000 "$@" >> $R/r4_bJ_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batchJ.log
}
run ramp_off python scripts/r4_sparse.py rampab off
run ramp_on  python scripts/r4_sparse.py rampab on
echo "=== batchJ done ($(date +%H:%M:%S))" | tee -a $R/r4_batchJ.log
