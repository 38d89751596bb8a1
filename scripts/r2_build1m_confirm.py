"""Confirm the constructionExpand=4 default at 1M: synced SIFT-1M
build + int8-store headline sweep vs the cached (healthy) gold — the
300k tune says 15% faster at identical recall; this pins the 1M
build_s and re-checks the 23.5k @ 0.968 ef=14 headline on a graph
built entirely under the new default.

Appends JSON to /tmp/r2_b1mc.jsonl.
"""

import json
import os
import time
import traceback

import numpy as np

LOG = "/tmp/r2_b1mc.jsonl"
N, NQ, K = 1_000_000, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + NQ, 128, seed=0)
    corpus, q = pts[:N], pts[N:]
    gpath = "/tmp/gold_sift1m_l2.npz"
    if not os.path.exists(gpath):
        # /tmp gold wiped (VM reset) — regenerate via the exact scan
        ex = Index("l2", Params(dim=128), method="seq_search")
        ex.add_dense_batch(corpus)
        ex.build_index(Params())
        _, gi = ex.knn_query_batch(q, K)
        np.savez(gpath, ids=np.asarray(gi))
        del ex
    gold = np.load(gpath)["ids"]
    try:
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=100, waveSize=1024,
                               replicateNeighbors=1, nbrStoreDtype="int8"))
        float(jnp.sum(idx.method.graph["level0"]))
        emit(event="build_ok", expand=idx.method.construction_expand,
             build_s=round(time.perf_counter() - t0, 1))
        for ef in (10, 14, 20, 50):
            idx.set_query_time_params(Params(efSearch=ef))
            d, i = idx.knn_query_batch(q, K)
            t0 = time.perf_counter()
            d, i = idx.knn_query_batch(q, K)
            dt = time.perf_counter() - t0
            rec = float(np.mean([
                len(set(a[a >= 0]) & set(b)) / K for a, b in zip(i, gold)
            ]))
            emit(ef=ef, qps=round(NQ / dt, 1), recall_at_10=round(rec, 4))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
