"""vptree / NAPP at the 1M operating point on real TPU (VERDICT item 6).

Usage: python scripts/r2_tree_1m.py vptree|napp
Appends JSON lines to /tmp/r2_tree_1m.jsonl. Run per-method in separate
processes (a fault in one must not take the other down).
"""

import json
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_tree_1m.jsonl"
N = 1_000_000
NQ = 2048


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


def gold_ids(corpus, q, k=10):
    import os

    path = "/tmp/gold_sift1m_l2.npz"
    if os.path.exists(path):
        return np.load(path)["ids"]
    from tpu_knn import Index, Params

    ex = Index("l2", Params(dim=128), method="seq_search")
    ex.add_dense_batch(corpus)
    ex.build_index()
    _, ids = ex.knn_query_batch(q, k)
    ids = np.asarray(ids)
    np.savez(path, ids=ids)
    return ids


def recall(ids, gold):
    return float(
        np.mean([len(set(a[a >= 0]) & set(b)) / gold.shape[1] for a, b in zip(ids, gold)])
    )


def run_queries(idx, q, gold, tag, qtp=None, warm=True):
    from tpu_knn import Params

    if qtp:
        idx.set_query_time_params(Params(**qtp))
    d, i = idx.knn_query_batch(q, 10)
    sync(d)
    t0 = time.perf_counter()
    d, i = idx.knn_query_batch(q, 10)
    sync(d)
    dt = time.perf_counter() - t0
    emit(stage=tag, event="query", qtp=qtp, qps=round(NQ / dt, 1),
         recall_at_10=round(recall(np.asarray(i), gold), 4))


def main():
    which = sys.argv[1]
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + NQ, 128, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    gold = gold_ids(corpus, q)

    try:
        if which == "vptree":
            idx = Index("l2", Params(dim=128), method="vptree")
            idx.add_dense_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(bucketSize=64))
            sync(idx.method._tree["leaf_members"])
            emit(stage="vptree", event="build_ok",
                 build_s=round(time.perf_counter() - t0, 1),
                 depth=idx.method.depth, leaf_cap=idx.method.leaf_cap)
            for alpha in (1.0, 2.0, 4.0, 8.0, 16.0):
                run_queries(idx, q, gold, "vptree",
                            {"alphaLeft": alpha, "alphaRight": alpha})
        elif which == "napp":
            idx = Index("l2", Params(dim=128), method="napp")
            idx.add_dense_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(numPivot=512, numPrefix=32))
            sync(idx.method._prefix)
            emit(stage="napp", event="build_ok",
                 build_s=round(time.perf_counter() - t0, 1))
            for nps, mt in ((32, 2), (16, 2), (8, 2), (32, 4)):
                run_queries(idx, q, gold, "napp",
                            {"numPrefixSearch": nps, "minTimes": mt})
    except Exception:
        emit(stage=which, event="crash", err=traceback.format_exc()[-800:])
        sys.exit(2)


if __name__ == "__main__":
    main()
