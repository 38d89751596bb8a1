"""vptree gathered traversal at 1M: the maxLeavesToVisit qps/recall
Pareto the masked path couldn't express (79 qps flat in alpha — every
query batch paid a full 1M masked scan regardless of pruning). The
gathered phase 4 scores only the selected leaves' rows, so work is
O(Q * maxLeaves * leaf_cap). Sweeps maxLeavesToVisit at alpha=1 and
tuned-ish alphas; one masked-path row (alpha=1, uncapped = exact) as
the anchor. Gold: cached /tmp/gold_sift1m_l2.npz (host-era, healthy).

Appends JSON to /tmp/r2_vpg.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_vpg.jsonl"
N, NQ, K = 1_000_000, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ]))


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + NQ, 128, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    gold = np.load("/tmp/gold_sift1m_l2.npz")["ids"]
    try:
        idx = Index("l2", Params(dim=128), method="vptree")
        idx.add_dense_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(bucketSize=64))
        import jax.numpy as jnp

        float(jnp.sum(idx.method._tree["leaf_members"]))
        emit(event="build_ok", build_s=round(time.perf_counter() - t0, 1),
             depth=idx.method.depth, leaf_cap=idx.method.leaf_cap)
        import sys

        # NB: maxLeavesToVisit is a STATIC shape arg — each distinct
        # value compiles a fresh 1M program (compiles measured fast for
        # this program, ~3 min total run); alphas are traced and free.
        sweep = (
            (1.0, 8), (4.0, 8),
            (1.0, 32), (4.0, 32), (16.0, 32),
            (1.0, 128), (4.0, 128),
        )
        if len(sys.argv) > 1 and sys.argv[1] == "fine":
            # round 2 follow-up: alpha=4 dominated every cap (alpha=1
            # visits too many leaves for the cap, 16 over-prunes) —
            # refine around it and extend the cap for the high-recall
            # end (512*64 gathered rows/query still < N/4)
            sweep = (
                (2.0, 32), (3.0, 32), (6.0, 32),
                (2.0, 128), (3.0, 128), (6.0, 128), (8.0, 128),
                (3.0, 512), (4.0, 512), (6.0, 512),
            )
        for alpha, ml in sweep:
            idx.set_query_time_params(Params(
                alphaLeft=alpha, alphaRight=alpha, maxLeavesToVisit=ml))
            d, i = idx.knn_query_batch(q, K)  # warm exact shape
            t0 = time.perf_counter()
            d, i = idx.knn_query_batch(q, K)
            dt = time.perf_counter() - t0
            emit(alpha=alpha, maxLeaves=ml, qps=round(NQ / dt, 1),
                 recall_at_10=round(recall(i, gold), 4))
        if len(sys.argv) > 1 and sys.argv[1] == "fine":
            return
        # masked exact anchor (uncapped, alpha=1): the old default path
        idx.set_query_time_params(None)
        d, i = idx.knn_query_batch(q, K)
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        dt = time.perf_counter() - t0
        emit(alpha=1.0, maxLeaves="inf", qps=round(NQ / dt, 1),
             recall_at_10=round(recall(i, gold), 4))
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-800:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
