"""vptree 1M Pareto re-sweep after the pruner-ordered leaf budget
(VERDICT r2 item 7). The round-2 gathered cap took the first-L visited
leaves in INDEX order, so alpha=1 + small L scored 0.26-0.40 recall;
the budget now goes to ascending pruner-bound leaves (the reference's
recursion order, vptree.cc:417-470). Done = monotone recall-vs-L at
alpha=1 with usable small-L points.

Durable: bench_results/r3_tree.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "bench_results", "r3_tree.jsonl")
GOLD_DIR = os.environ.get("TPU_KNN_DATA_CACHE", "/tmp/tpu_knn_cache")
N, NQ, K = 1_000_000, 2048, 10


def emit(**kw):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like
    from tpu_knn.utils.jitcache import enable_persistent_cache
    import jax.numpy as jnp

    enable_persistent_cache()
    try:
        pts = sift_like(N + NQ, 128, seed=0)
        corpus, q = pts[:N], pts[N:]
        gpath = os.path.join(GOLD_DIR, "gold_sift1m_l2.npz")
        if os.path.exists(gpath):
            gold = np.load(gpath)["ids"]
        else:
            ex = Index("l2", Params(dim=128), method="seq_search")
            ex.add_dense_batch(corpus)
            ex.build_index()
            _, gold = ex.knn_query_batch(q, K)
            gold = np.asarray(gold)
            os.makedirs(GOLD_DIR, exist_ok=True)
            np.savez(gpath, ids=gold)
            del ex
        emit(event="gold_ok")

        idx = Index("l2", Params(dim=128), method="vptree")
        idx.add_dense_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(bucketSize=64))
        float(jnp.sum(idx.method._tree["leaf_members"]))
        emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1))

        for alpha in (1.0, 2.0, 4.0):
            for L in (4, 8, 16, 32, 64):
                idx.set_query_time_params(Params(
                    alphaLeft=alpha, alphaRight=alpha, maxLeavesToVisit=L))
                d, i = idx.knn_query_batch(q, K)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                dt = time.perf_counter() - t0
                rec = float(np.mean([
                    len(set(a[a >= 0]) & set(b)) / K
                    for a, b in zip(np.asarray(i), gold)
                ]))
                emit(alpha=alpha, L=L, qps=round(NQ / dt, 1),
                     recall_at_10=round(rec, 4))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-800:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
