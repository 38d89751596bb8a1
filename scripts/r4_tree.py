"""Round-4 vptree 1M parameter surface (VERDICT r3 item 7): bucketSize
{32,64,128,256} x maxLeaves {16,32,64} at k=10, plus k {1,100} at the
round-3 best point (bucketSize=64, L=32), all on the pruner-ordered
leaf budget. alpha=2 everywhere (the r3 sweep showed the bound ORDER is
alpha-invariant below ~2 and alpha=2 ran fastest at equal recall).

Also: one NAPP range timing row at 1M dense l2 (VERDICT item 2 asks a
1M timing to accompany the new range path) at the bench radius class.

Durable outputs: bench_results/r4_tree.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "bench_results", "r4_tree.jsonl")
K = 10


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

    enable_persistent_cache()
    n, nq = 1_000_000, 2048
    x = sift_like(n + nq, 128, seed=0)
    corpus, queries = x[:n], x[n:]

    ex = Index("l2", Params(dim=128), method="seq_search")
    ex.add_dense_batch(corpus)
    gd, gids = ex.knn_query_batch(queries, 100)
    gids = np.asarray(gids)
    emit(event="gold_ok")

    def rec(ids, k):
        return float(np.mean([
            len(set(a[a >= 0]) & set(b[:k])) / k for a, b in zip(np.asarray(ids), gids)
        ]))

    stage = sys.argv[1] if len(sys.argv) > 1 else "all"

    if stage in ("all", "tree"):
        best_idx = None
        for bs in (32, 64, 128, 256):
            t0 = time.perf_counter()
            idx = Index("l2", Params(dim=128), method="vptree")
            idx.add_dense_batch(corpus)
            idx.build_index(Params(bucketSize=bs))
            # sync: leaf arrays are host-built; a query forces the rest
            emit(event="built", bucketSize=bs,
                 build_s=round(time.perf_counter() - t0, 1),
                 depth=idx.method.depth)
            for L in (16, 32, 64):
                idx.set_query_time_params(Params(
                    alphaLeft=2.0, alphaRight=2.0, maxLeavesToVisit=L))
                idx.knn_query_batch(queries, K)
                t0 = time.perf_counter()
                _, ids = idx.knn_query_batch(queries, K)
                dt = time.perf_counter() - t0
                emit(stage="tree", bucketSize=bs, L=L, k=K,
                     qps=round(nq / dt, 1), recall=round(rec(ids, K), 4))
            if bs == 64:
                best_idx = idx
            else:
                del idx
        # k sweep at the r3 operating point
        if best_idx is not None:
            for k in (1, 100):
                best_idx.set_query_time_params(Params(
                    alphaLeft=2.0, alphaRight=2.0, maxLeavesToVisit=32))
                best_idx.knn_query_batch(queries, k)
                t0 = time.perf_counter()
                _, ids = best_idx.knn_query_batch(queries, k)
                dt = time.perf_counter() - t0
                emit(stage="tree_k", bucketSize=64, L=32, k=k,
                     qps=round(nq / dt, 1), recall=round(rec(ids, k), 4))
            del best_idx

    if stage in ("all", "napprange"):
        # NAPP range at 1M dense l2, bench radius class (~19 hits)
        radius = float(np.median(np.asarray(gd)[:, 9]))
        nq2 = 512
        wres = ex.range_query_batch(queries[:nq2], radius)  # oracle
        idx = Index("l2", Params(dim=128), method="napp")
        idx.add_dense_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(numPivot=512, numPrefix=32))
        emit(event="napp_built", build_s=round(time.perf_counter() - t0, 1))
        for mt in (1, 2):
            idx.set_query_time_params(Params(minTimes=mt))
            idx.range_query_batch(queries[:nq2], radius)  # compile+warm
            t0 = time.perf_counter()
            res = idx.range_query_batch(queries[:nq2], radius)
            dt = time.perf_counter() - t0
            cov = sum(len(set(g.ids) & set(w.ids)) for g, w in zip(res, wres))
            tot = sum(len(w.ids) for w in wres)
            fp = sum(len(set(g.ids) - set(w.ids)) for g, w in zip(res, wres))
            emit(stage="napprange", n=n, radius=round(radius, 1), minTimes=mt,
                 qps=round(nq2 / dt, 1), hit_coverage=round(cov / max(tot, 1), 4),
                 false_positives=fp)
        del idx


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        emit(event="error", error=repr(e), tb=traceback.format_exc()[-2000:])
        raise
