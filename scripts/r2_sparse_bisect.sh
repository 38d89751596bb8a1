#!/bin/bash
# Sparse-HNSW TPU validation: each stage is a fresh process (a worker
# crash kills the jax client). Sleeps after a crash for worker recovery.
# Round-2 sketch-proxy design: construction on dense JL sketches +
# hybrid exact base refinement; queries traverse with exact sparse
# scoring (densified-query tables).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
RUN() {
  echo "=== stage $* ===" >&2
  timeout 3000 python scripts/r2_sparse_stage.py "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "=== stage $* rc=$rc; sleeping for worker recovery ===" >&2
    sleep 240
  fi
  return $rc
}

# S1: 10k smoke of the sketch-proxy build + exact-traversal queries
RUN 10000 512 100 sweep

# S2: the 100k bench config (the scale that faulted the round-1 wave
# program during build)
RUN 100000 1024 100 sweep
echo "=== validation done ===" >&2
