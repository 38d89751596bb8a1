"""NN-descent construction beyond SIFT-l2: GloVe-1.2M cosine and the
100k sparse sketch-proxy build (stages: glove | sparse).

Anchors (wave build, fixed transport): GloVe build 830.9 s synced,
ef=14 14.7k qps @ 0.9742; sparse 100k build 468 s, ef=100 5.2k @ 0.981.
Golds are the cached exact-scan files from the earlier runs (regenerated
if the VM wipe removed them).

Appends JSON to /tmp/r2_nnd.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_nnd.jsonl"
K = 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / K
        for a, b in zip(np.asarray(ids), np.asarray(gold))
    ]))


def sweep(idx, q, gold, tag, efs):
    from tpu_knn import Params

    for ef in efs:
        idx.set_query_time_params(Params(efSearch=ef))
        d, i = idx.knn_query_batch(q, K)
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        dt = time.perf_counter() - t0
        emit(tag=tag, ef=ef, qps=round(len(q) / dt, 1),
             recall_at_10=round(recall(i, gold), 4))


def glove():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import glove_like

    n, d, nq = 1_200_000, 100, 2048
    pts = glove_like(n + nq, d, seed=0)
    corpus, q = pts[:n], pts[n:]
    gpath = "/tmp/gold_glove12m_cos.npz"
    if os.path.exists(gpath):
        gold = np.load(gpath)["ids"]
    else:
        ex = Index("cosinesimil", Params(dim=d), method="seq_search")
        ex.add_dense_batch(corpus)
        ex.build_index()
        _, gold = ex.knn_query_batch(q, K)
        gold = np.asarray(gold)
        np.savez(gpath, ids=gold)
        del ex
    emit(stage="glove", event="gold_ok")
    idx = Index("cosinesimil", Params(dim=d), method="hnsw")
    idx.add_dense_batch(corpus)
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, buildAlgo="nndescent",
                           replicateNeighbors=1, nbrStoreDtype="int8"))
    float(jnp.sum(idx.method.graph["level0"]))
    emit(tag="nnd_glove", event="build_ok",
         build_s=round(time.perf_counter() - t0, 1))
    sweep(idx, q, gold, "nnd_glove", (10, 14, 20, 50))


def sparse():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    n, nq, vocab = 100_000, 512, 30_000
    pts = sparse_like(n + nq, vocab=vocab, nnz=64, seed=0)
    corpus, q = pts[:n], pts[n:]
    # HOST f64 truth, never a device self-gold (sparse_gold.py; same
    # path/params as r2_sparse_quality.py)
    gpath = f"/tmp/sparse_gold_{n}.npz"
    if os.path.exists(gpath):
        gold = np.load(gpath)["ids"]
    else:
        from sparse_gold import host_f64_gold

        gold = host_f64_gold(corpus, q, k=K, vocab=vocab)
        np.savez(gpath, ids=gold)
    emit(stage="sparse", event="gold_ok")
    idx = Index("cosinesimil_sparse", method="hnsw",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    t0 = time.perf_counter()
    idx.build_index(Params(M=16, efConstruction=100, buildAlgo="nndescent"))
    float(jnp.sum(idx.method.graph["level0"]))
    emit(tag="nnd_sparse100k", event="build_ok",
         build_s=round(time.perf_counter() - t0, 1))
    sweep(idx, q, gold, "nnd_sparse100k", (20, 50, 100, 200))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "glove"
    try:
        {"glove": glove, "sparse": sparse}[stage]()
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
