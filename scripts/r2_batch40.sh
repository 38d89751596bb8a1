#!/bin/bash
# Round-2 fortieth batch: the construction-wall levers that need no new
# code, plus driver-path validation. Chained behind batch39 (pass its
# PID). Stages:
#   prof   — fresh 10-wave op attribution at the shipped defaults
#            (expand=4 era; the r2_bprof table that said "gather-bound"
#            predates expand=4 and was lost in the VM restart) — decides
#            whether an incrementally-maintained construction nbr-store
#            is worth building (granule-count-bound gathers) or the
#            beam is fusion/loop-bound (it is not).
#   efc1m  — 1M same-process sweep: e4c100 anchor / e4c50 / e4c64 /
#            e8c100, each with an ef 10/14/20/50 query Pareto. efC<=128
#            all carry 128 beam lanes; iterations track ef/expand — if
#            c50/c64 hold the ef=20 Pareto, the 593 s wall drops for
#            free toward the reference's 231 s.
#   bench  — full bench.py end-to-end (the driver runs this at round
#            end; first run with the persistent jit cache enabled —
#            validate it on-chip before the driver does).
# Usage: r2_batch40.sh [WAIT_PID]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export TPU_KNN_JIT_CACHE=/root/.cache/tpu_knn/jaxcache
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  sleep 60
fi
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b40_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_build_prof.py 1800
run r2_build_tune.py 7200 efc1m
echo "=== bench ($(date +%H:%M:%S)) ==="
timeout 3600 python bench.py > /tmp/r2_b40_bench.json 2> /tmp/r2_b40_bench.log
echo "=== bench done rc=$? ($(date +%H:%M:%S)) ==="
echo "=== batch40 complete ($(date +%H:%M:%S)) ==="
