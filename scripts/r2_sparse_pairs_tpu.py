"""100k sparse-HNSW with the MXU exactPairs backend + the single-pass
exact-scan routing — the two fixes for the round-2 sparse findings:

  * every exactPairs build crashed the TPU worker at an early-wave sync
    while exactPairs-off builds completed (r2_scrash.jsonl) — the
    isolated suspect was pair_dots_qdense's [bk, C, C2*nnz]
    take_along_axis; PAIR_BACKEND="mxu" replaces it with both-sides
    densify + batched matmul (formulation proven exact on-device
    post-hint-fix, r2_sscan_speed.jsonl blocked_vs_gather ~1e-5).
  * the sparse exact scan now routes single-pass with the query densify
    in-jit (two-pass measured 647.8 ms device vs 98.7 single-pass;
    eager query encode cost 458 ms wall — r2_sprof.jsonl).

Usage: python scripts/r2_sparse_pairs_tpu.py <stage>
  scan:    production exact-scan wall qps at chunkSize 256/1024/2048
  base:    efC=100 M=16 build (exactBase+exactPairs DEFAULT ON) + sweep
  base200: efC=200 M=16 ditto
  napp:    NAPP numPivot=512 numPrefix=32 + minTimes sweep (the ANN
           comparison row, re-scored against the f64 host gold)
Appends JSON lines to /tmp/r2_spairs.jsonl. One stage per process (a
worker crash kills the process; ~3-5 min recovery before the next).
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_spairs.jsonl"
N, NQ, K = 100_000, 512, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def sync(x):
    # knn_query_batch returns HOST numpy (already blocked): re-wrapping
    # it in jnp.asarray re-uploads over the tunnel (~80 ms/batch, wall
    # probe r2_wall.jsonl) and biased every qps row measured through
    # this helper LOW. Only sync genuine device arrays.
    import numpy as np

    if isinstance(x, np.ndarray):
        return float(x.reshape(-1)[:1].sum())
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x)))


def recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ]))


def main():
    stage = sys.argv[1]
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    gpath = f"/tmp/sparse_gold_{N}.npz"
    if os.path.exists(gpath):
        gold = np.load(gpath)["ids"]
    else:
        # HOST f64 truth, never a device self-gold (see sparse_gold.py).
        from sparse_gold import host_f64_gold

        gold = host_f64_gold(corpus, q, k=K, vocab=30_000)
        np.savez(gpath, ids=gold)

    try:
        if stage == "scan":
            import jax

            for chunk in (256, 1024, 2048):
                jax.clear_caches()
                ex = Index("cosinesimil_sparse", method="seq_search",
                           data_type=DataKind.SPARSE)
                ex.add_sparse_batch(corpus)
                ex.build_index(Params(chunkSize=chunk))
                d, i = ex.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = ex.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                emit(stage="scan", chunk=chunk, qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
            return

        if stage == "napp":
            idx = Index("cosinesimil_sparse", method="napp",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(numPivot=512, numPivotIndex=32))
            emit(stage="napp", event="build_ok",
                 build_s=round(time.perf_counter() - t0, 1))
            for mt in (2, 3, 4):
                idx.set_query_time_params(Params(minTimes=mt))
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                emit(stage="napp", minTimes=mt, qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
            return

        efc = {"base200": 200}.get(stage, 100)
        from tpu_knn.ops import sparse as S

        idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        idx.add_sparse_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=efc, waveSize=1024,
                               sketchQuery=1), print_progress=True)
        sync(idx.method.graph["level0"])
        emit(stage=stage, event="build_ok", efC=efc,
             pair_backend=S.PAIR_BACKEND,
             build_s=round(time.perf_counter() - t0, 1))

        for sq, efs in ((0, (20, 50, 100, 200)), (1, (100, 200))):
            idx.method.sketch_query = sq
            for ef in efs:
                idx.set_query_time_params(Params(efSearch=ef))
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                emit(stage=stage, sketch_query=sq, ef=ef,
                     qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-800:])
        sys.exit(2)


if __name__ == "__main__":
    main()
