"""Sparse HNSW at 1M — the first sparse-ANN scale row beyond 100k.

Same dataset as r2_sparse_1m.py (1M bag-of-words docs, vocab 60k,
nnz<=64, cosinesimil_sparse, 512 queries). Build: sketch-proxy wave
construction + exact refinement + exactPairs-MXU heuristic scoring
(the TPU-stable path that beats the reference's recall at 100k).
Gold: the device exact scan (f64-verified exact at both 100k and 1M,
f64_spot_recall 1.0 — r2_sparse1m.jsonl). Sweep: exact traversal at
ef 20/50/100/200 plus the sketch-scored traversal.

Appends JSON to /tmp/r2_shnsw1m.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_shnsw1m.jsonl"
N, NQ, K, VOCAB = 1_000_000, 512, 10, 60_000


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / K
        for a, b in zip(np.asarray(ids), np.asarray(gold))
    ]))


def main():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=VOCAB, nnz=64, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    try:
        import os

        gpath = "/tmp/gold_sparse1m.npz"
        if os.path.exists(gpath):
            gold = np.load(gpath)["ids"]
        else:
            ex = Index("cosinesimil_sparse", method="seq_search",
                       data_type=DataKind.SPARSE)
            ex.add_sparse_batch(corpus)
            ex.build_index(Params(chunkSize=2048))
            _, gold = ex.knn_query_batch(q, K)
            gold = np.asarray(gold)
            np.savez(gpath, ids=gold)
            del ex
        emit(event="gold_ok")

        idx = Index("cosinesimil_sparse", method="hnsw",
                    data_type=DataKind.SPARSE)
        idx.add_sparse_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(
            Params(M=16, efConstruction=100, waveSize=1024),
            print_progress=True,
        )
        float(jnp.sum(idx.method.graph["level0"]))
        emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1))
        for sq in (0, 1):
            idx.method.sketch_query = sq
            for ef in (20, 50, 100, 200):
                if sq and ef < 100:
                    continue
                idx.set_query_time_params(Params(efSearch=ef))
                d, i = idx.knn_query_batch(q, K)  # warm exact shape
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                dt = time.perf_counter() - t0
                emit(sketch_query=sq, ef=ef, qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
