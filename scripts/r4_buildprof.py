"""Where does the cold-process 1M NND build spend its ~304 s when the
same build measured 253.7 s warm-in-process (r3 nnd1m_ps1)? The driver
runs bench.py cold, so closing hnsw1m_vs_ref_build from 0.76 to >=0.9
needs the cold-process overhead attributed: corpus encode/upload, jit
cache deserialization (log_compiles shows cache hits vs misses), NND
phase walls (TPU_KNN_NND_PROFILE=1 syncs sub-phases), int8 store build.

Durable outputs: bench_results/r4_buildprof.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "bench_results", "r4_buildprof.jsonl")


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax

    jax.config.update("jax_log_compiles", True)

    import logging

    compiles = []

    class H(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "Compiling" in msg or "compil" in msg.lower():
                compiles.append((round(time.time(), 1), msg[:160]))

    logging.getLogger("jax").addHandler(H())
    logging.getLogger("jax._src.interpreters.pxla").addHandler(H())

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    n = 1_000_000
    x = sift_like(n + 2048, 128, seed=0)
    t_load = time.perf_counter()
    idx = Index("l2", Params(dim=128), method="hnsw")
    t0 = time.perf_counter()
    idx.add_dense_batch(x[:n])
    t_add = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, waveSize=1024,
                           replicateNeighbors=1, nbrStoreDtype="int8",
                           nndProfile=1))
    t_build = time.perf_counter() - t0
    # force everything synced
    import jax.numpy as jnp

    float(jnp.sum(idx.method.graph["level0"]))
    t_total = time.perf_counter() - t_load
    emit(stage="buildprof", add_s=round(t_add, 1), build_s=round(t_build, 1),
         total_s=round(t_total, 1), n_compile_events=len(compiles))
    for t, msg in compiles:
        emit(stage="compile_event", at=t, msg=msg)


if __name__ == "__main__":
    main()
