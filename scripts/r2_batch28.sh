#!/bin/bash
# Round-2 twenty-eighth batch — sparse NAPP re-measure after the
# query-densify hoist (1M was gated on per-iteration table copies) +
# a fresh profile to confirm what remains.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
if [ -f /tmp/batch27.pid ]; then
  while kill -0 "$(cat /tmp/batch27.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 30
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b28_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_sparse_1m.py 2400 napp
run r2_napp_prof.py 3000
