"""Round-2 batched TPU verification: the sparse-HNSW wave program after
the densified-scoring rewrite (q_dense built in-jit from the corpus's
vocab_mark; _score_pairs/mate/reverse all on take_along_axis paths — no
searchsorted anywhere in the construction program).

One script = one TPU round-trip (CLAUDE.md crash economics). Appends a
JSON line to /tmp/r2_verify.jsonl after EVERY stage so a worker fault
still leaves evidence of how far we got. Sync discipline: a host read of
float(jnp.sum(...)) after every suspect build/query (async dispatch hides
faults until the next sync).

Stages:
  0 dense smoke  — 10k l2 hnsw, self-recall + save/load (verify recipe)
  1 sparse 10k   — build + SYNC + query 512, recall vs exact scan
  2 sparse 100k  — build + SYNC + ef sweep, recall/QPS vs exact scan
  3 sparse exact — 100k exact-scan QPS (dense-after-scatter path)
"""

import json
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_verify.jsonl"


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
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like, sparse_like

    t_start = time.perf_counter()

    # ---- stage 0: dense smoke --------------------------------------
    try:
        x = sift_like(10_248, 128, seed=0)
        corpus, queries = x[:10_000], x[10_000:10_248]
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(corpus)
        idx.build_index(Params(M=16, efConstruction=100, waveSize=512))
        sync(idx.method.graph["level0"])
        idx.set_query_time_params(Params(efSearch=50))
        d, i = idx.knn_query_batch(corpus[:248], 5)
        self_ok = float(np.mean(np.asarray(i)[:, 0] == np.arange(248)))
        idx.save("/tmp/r2_dense_idx")
        idx2 = Index.load("/tmp/r2_dense_idx")
        d2, i2 = idx2.knn_query_batch(corpus[:248], 5)
        emit(stage="dense_smoke", ok=True, self_recall=self_ok,
             roundtrip_equal=bool(np.array_equal(np.asarray(i), np.asarray(i2))))
    except Exception:
        emit(stage="dense_smoke", ok=False, err=traceback.format_exc()[-2000:])
        return

    # ---- sparse datasets -------------------------------------------
    pts10 = sparse_like(10_512, vocab=30_000, nnz=64, seed=0)
    corpus10, q10 = pts10[:10_000], pts10[10_000:10_512]
    SPACE = "cosinesimil_sparse"

    # exact gold for 10k
    ex = Index(SPACE, method="seq_search", data_type="sparse_vector")
    ex.add_sparse_batch(corpus10)
    ex.build_index()
    t0 = time.perf_counter()
    gd, gold10 = ex.knn_query_batch(q10, 10)
    sync(gd)
    emit(stage="sparse10k_exact", ok=True, s=round(time.perf_counter() - t0, 2))

    # ---- stage 1: sparse hnsw 10k ----------------------------------
    try:
        idx = Index(SPACE, method="hnsw", data_type="sparse_vector")
        idx.add_sparse_batch(corpus10)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=100, waveSize=512))
        s_build = sync(idx.method.graph["level0"])  # surface async faults NOW
        build_s = time.perf_counter() - t0
        idx.set_query_time_params(Params(efSearch=50))
        d, i = idx.knn_query_batch(q10, 10)
        sync(d)
        rec = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / 10 for a, b in zip(np.asarray(i), np.asarray(gold10))
        ]))
        emit(stage="sparse_hnsw_10k", ok=True, build_s=round(build_s, 1),
             recall_at_10=round(rec, 4), lvl0_sum=s_build)
    except Exception:
        emit(stage="sparse_hnsw_10k", ok=False, err=traceback.format_exc()[-2000:])
        return

    # ---- stage 2: sparse hnsw 100k ---------------------------------
    pts100 = sparse_like(100_512, vocab=30_000, nnz=64, seed=0)
    corpus100, q100 = pts100[:100_000], pts100[100_000:100_512]
    ex = Index(SPACE, method="seq_search", data_type="sparse_vector")
    ex.add_sparse_batch(corpus100)
    ex.build_index()
    # compile + one timed sweep = stage 3 data too
    gd, gold100 = ex.knn_query_batch(q100, 10)
    sync(gd)
    t0 = time.perf_counter()
    gd, gold100 = ex.knn_query_batch(q100, 10)
    sync(gd)
    exact_qps = len(q100) / (time.perf_counter() - t0)
    emit(stage="sparse_exact_100k", ok=True, qps=round(exact_qps, 1))

    try:
        idx = Index(SPACE, method="hnsw", data_type="sparse_vector")
        idx.add_sparse_batch(corpus100)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=200, waveSize=1024))
        s_build = sync(idx.method.graph["level0"])
        build_s = time.perf_counter() - t0
        rows = []
        for ef in (20, 50, 100):
            idx.set_query_time_params(Params(efSearch=ef))
            d, i = idx.knn_query_batch(q100, 10)  # compile at shape
            sync(d)
            t0 = time.perf_counter()
            d, i = idx.knn_query_batch(q100, 10)
            sync(d)
            dt = time.perf_counter() - t0
            rec = float(np.mean([
                len(set(a[a >= 0]) & set(b)) / 10
                for a, b in zip(np.asarray(i), np.asarray(gold100))
            ]))
            rows.append({"ef": ef, "qps": round(len(q100) / dt, 1),
                         "recall@10": round(rec, 4)})
            emit(stage="sparse_hnsw_100k_ef", ok=True, **rows[-1])
        emit(stage="sparse_hnsw_100k", ok=True, build_s=round(build_s, 1),
             rows=rows, total_min=round((time.perf_counter() - t_start) / 60, 1))
    except Exception:
        emit(stage="sparse_hnsw_100k", ok=False, err=traceback.format_exc()[-2000:])


if __name__ == "__main__":
    sys.stderr.write(f"logging to {LOG}\n")
    main()
