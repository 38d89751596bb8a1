#!/bin/bash
# Round-4 TPU batch 3: waits for batch 2 (pass its bash PID as $1).
set -u
cd /root/repo
R=bench_results
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 10
fi
run() {
  tag=$1; shift
  echo "=== $tag: $* ($(date +%H:%M:%S))" | tee -a $R/r4_batch3.log
  timeout 5400 "$@" >> $R/r4_b3_$tag.log 2>&1
  echo "=== $tag rc=$? ($(date +%H:%M:%S))" | tee -a $R/r4_batch3.log
}
run bigbatch python scripts/r4_sscan_bigbatch.py
run bench    python bench.py
echo "=== batch3 done ($(date +%H:%M:%S))" | tee -a $R/r4_batch3.log
