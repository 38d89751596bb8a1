"""GloVe-1.2M cosine HNSW sweep with packed query transport + clean
timing (the round-1 12.1k @ 0.990 row predates both). Gold from a
resident exact index (also packed transport). Appends JSON to
/tmp/r2_glove.jsonl.
"""

import json
import os
import time
import traceback

import numpy as np

LOG = "/tmp/r2_glove.jsonl"
N, D, Q, K = 1_200_000, 100, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import glove_like

    pts = glove_like(N + Q, D, seed=0)
    corpus, q = pts[:N], pts[N : N + Q]
    gpath = "/tmp/gold_glove12m_cos.npz"
    try:
        ex = Index("cosinesimil", Params(dim=D), method="seq_search")
        ex.add_dense_batch(corpus)
        ex.build_index()
        if os.path.exists(gpath):
            gold = np.load(gpath)["ids"]
        else:
            t0 = time.perf_counter()
            _, gold = ex.knn_query_batch(q, K)
            emit(event="gold_scan_s", s=round(time.perf_counter() - t0, 1))
            gold = np.asarray(gold)
            np.savez(gpath, ids=gold)
        # exact-scan wall row (packed transport), same resident index
        ex.knn_query_batch(q, K)
        t0 = time.perf_counter()
        ex.knn_query_batch(q, K)
        emit(event="exact_scan", qps=round(Q / (time.perf_counter() - t0), 1))
        del ex

        idx = Index("cosinesimil", Params(dim=D), method="hnsw")
        idx.add_dense_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=100, waveSize=1024))
        import jax.numpy as jnp

        float(jnp.sum(idx.method.graph["level0"]))
        emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1))
        for ef in (10, 14, 20, 50, 100):
            idx.set_query_time_params(Params(efSearch=ef))
            idx.knn_query_batch(q, K)  # warm at the exact shape
            t0 = time.perf_counter()
            d, i = idx.knn_query_batch(q, K)
            dt = time.perf_counter() - t0
            rec = float(np.mean([
                len(set(a[a >= 0]) & set(b)) / K for a, b in zip(i, gold)
            ]))
            emit(ef=ef, qps=round(Q / dt, 1), recall_at_10=round(rec, 4))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-800:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
