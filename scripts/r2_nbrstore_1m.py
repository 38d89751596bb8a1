"""1M SIFT HNSW with the int8 replicated neighbor store alongside a
resident gold index (VERDICT item 10): prove no RESOURCE_EXHAUSTED and
measure the qps effect vs the plain gather path.

Appends JSON lines to /tmp/r2_nbrstore.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_nbrstore.jsonl"
N, D, Q, K = 1_000_000, 128, 2048, 10


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


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + Q, D, seed=0)
    corpus, q = pts[:N], pts[N : N + Q]

    import os

    gpath = "/tmp/gold_sift1m_l2.npz"
    # keep the exact index RESIDENT: the point is surviving next to it
    ex = Index("l2", Params(dim=D), method="seq_search")
    ex.add_dense_batch(corpus)
    ex.build_index()
    if os.path.exists(gpath):
        gold = np.load(gpath)["ids"]
    else:
        _, gold = ex.knn_query_batch(q, K)
        gold = np.asarray(gold)
        np.savez(gpath, ids=gold)

    try:
        idx = Index("l2", Params(dim=D), method="hnsw")
        idx.add_dense_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=100, waveSize=1024,
                               replicateNeighbors=1, nbrStoreDtype="int8"))
        sync(idx.method.graph["level0"])
        emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1))
        for rn in (1, 0):
            idx.method.replicate_neighbors = rn
            idx.method._nbr_store = None
            # ef=10/14: matched-recall Pareto points vs the reference's
            # 17.9k qps @ recall 0.970 (ef=20, one core) on this dataset
            for ef in (10, 14, 20, 50, 100):
                idx.set_query_time_params(Params(efSearch=ef))
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                rec = float(np.mean([
                    len(set(a[a >= 0]) & set(b)) / K
                    for a, b in zip(np.asarray(i), gold)
                ]))
                emit(nbr_store="int8" if rn else "off", ef=ef,
                     qps=round(Q / dt, 1), recall_at_10=round(rec, 4),
                     mem_gb=round(idx.memory_usage_bytes() / 2**30, 2))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-800:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
