#!/bin/bash
# Round-2 twentieth batch — re-measure EVERYTHING batch19 produced:
# every batch19 number rode the f32-container result pack, whose
# bitcast ids are subnormals the TPU flushes to zero (6 of 10 ids per
# query came back 0 -> the "recall 0.4" collapse; r2_packed_diag.py).
# The container is int32 now and the diag passes all 26 stages on
# chip. Golds regenerated where the broken scan wrote them.
#   0. packed-vs-eager wall A/B (now with ids_equal required true)
#   1. SIFT-1M int8-store sweep (cached gold was healthy/eager-era)
#   2. sparse 100k quality build + sweep
#   3. GloVe-1.2M cosine sweep (gold regenerates: deleted below)
#   4. sparse 1M scan + f64 spot-check, then NAPP (gold regenerates)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
rm -f /tmp/gold_glove12m_cos.npz /tmp/gold_sparse1m.npz
run() {
  echo "=== $1 ${3:-} ($(date +%H:%M:%S)) ==="
  timeout "$2" python "scripts/$1" ${3:-} > "/tmp/r2_b20_$(basename "$1" .py)_${3:-x}.log" 2>&1
  echo "=== $1 ${3:-} done rc=$? ($(date +%H:%M:%S)) ==="
  sleep 30
}
run r2_qpack_ab.py 2400
run r2_async_pipeline.py 2400
run r2_nbrstore_1m.py 4200
run r2_sparse_pairs_tpu.py 4800 base
run r2_glove_1m.py 3000
run r2_sparse_1m.py 3600 scan
run r2_sparse_1m.py 2400 napp
