#!/bin/bash
# Round-2 sixteenth batch, in decision order:
#   1. dense traversal profile (batch15's dense stage died on an API
#      typo before touching the chip) — the ef=20 30k-device-qps hunt.
#   2. sparse HNSW quality sweep re-timed with the new default
#      GATHER_SCORING="support" (measured 17x over qdense in batch15;
#      this run produces the final recall+qps row for BASELINE.md).
#   3. 1M dense range queries (VERDICT item 8's "Done =" criterion).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch15.pid ]; then
  while kill -0 "$(cat /tmp/batch15.pid)" 2>/dev/null; do sleep 60; done
fi
run() {
  echo "=== $* ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" "${@:3}" > "/tmp/r2_b16_${3:-main}_$(basename "$1" .py).log" 2>&1
  echo "=== $1 done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_traversal_prof.py 2400 dense
run r2_sparse_pairs_tpu.py 4800 base
run r2_range_1m.py 2400
