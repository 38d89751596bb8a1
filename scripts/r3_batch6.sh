#!/bin/bash
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_JIT_CACHE="$PWD/.jaxcache"
export TPU_KNN_DATA_CACHE="$PWD/.datacache"
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 30
fi
timeout 3600 python scripts/r3_warm_bench_smoke.py > bench_results/r3_b6_warm.log 2>&1
echo "warm rc=$?" >> bench_results/r3_b6_warm.log
