#!/bin/bash
# Sparse-HNSW TPU fault bisect: each stage is a fresh process (a worker
# crash kills the jax client). Sleeps after a crash for worker recovery.
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

# S1: re-measure 10k with the einsum-precision fix (cheap, high info)
RUN 10000 512 100 sweep

# S2: pure corpus-scale test — 100k at the proven 10k shape params
if RUN 100000 512 100; then
  # scale is fine -> test waveSize, then efC (the full config)
  RUN 100000 1024 100 && RUN 100000 1024 200 sweep
else
  # scale faults even at proven shapes -> bisect N
  RUN 32000 512 100 && RUN 56000 512 100
fi
echo "=== bisect done ===" >&2
