"""One sparse-HNSW-on-TPU stage (run as a subprocess per stage: a TPU
worker crash kills the client backend, so each hypothesis gets a fresh
process). Appends one JSON line to /tmp/r2_bisect.jsonl.

Usage: python r2_sparse_stage.py N WAVE EFC [sweep]
"""

import json
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_bisect.jsonl"


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


def gold_for(n, corpus, queries, k=10):
    """Exact ids, cached on disk (the exact-scan compile costs minutes)."""
    import os

    path = f"/tmp/sparse_gold_{n}.npz"
    if os.path.exists(path):
        z = np.load(path)
        return z["ids"]
    from tpu_knn import Index

    ex = Index("cosinesimil_sparse", method="seq_search", data_type="sparse_vector")
    ex.add_sparse_batch(corpus)
    ex.build_index()
    _, gold = ex.knn_query_batch(queries, k)
    np.savez(path, ids=np.asarray(gold))
    return np.asarray(gold)


def main():
    n, wave, efc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    sweep = len(sys.argv) > 4 and sys.argv[4] == "sweep"
    tag = f"n{n}_w{wave}_efc{efc}"
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(n + 512, vocab=30_000, nnz=64, seed=0)
    corpus, q = pts[:n], pts[n : n + 512]
    gold = gold_for(n, corpus, q)

    try:
        idx = Index("cosinesimil_sparse", method="hnsw", data_type="sparse_vector")
        idx.add_sparse_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=efc, waveSize=wave))
        sync(idx.method.graph["level0"])  # surface the async fault NOW
        build_s = time.perf_counter() - t0
        emit(stage=tag, event="build_ok", build_s=round(build_s, 1))
    except Exception:
        emit(stage=tag, event="build_crash", err=traceback.format_exc()[-800:])
        sys.exit(2)

    try:
        efs = (20, 50, 100) if sweep else (50,)
        for ef in efs:
            idx.set_query_time_params(Params(efSearch=ef))
            d, i = idx.knn_query_batch(q, 10)
            sync(d)
            t0 = time.perf_counter()
            d, i = idx.knn_query_batch(q, 10)
            sync(d)
            dt = time.perf_counter() - t0
            rec = float(np.mean([
                len(set(a[a >= 0]) & set(b)) / 10
                for a, b in zip(np.asarray(i), gold)
            ]))
            emit(stage=tag, event="query_ok", ef=ef,
                 qps=round(512 / dt, 1), recall_at_10=round(rec, 4))
    except Exception:
        emit(stage=tag, event="query_crash", err=traceback.format_exc()[-800:])
        sys.exit(3)


if __name__ == "__main__":
    main()
