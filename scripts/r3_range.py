"""1M range queries on chip (VERDICT r2 item 5 'what's missing' #5).

Streamed seq_search range (seq_search.py:536, reference
seqsearch.cc:109-141) + pruned vptree range (vptree.py:567, reference
vptree.cc:417-470) at 1M x 128d, radius sweep at ~1/~10/~100 expected
hits. Hit COUNTS are validated against a host-f64 oracle (the count
is radius-threshold-sensitive at the f32 cancellation floor, so the
oracle allows a small boundary band).

Durable: bench_results/r3_range.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "bench_results", "r3_range.jsonl")
GOLD_DIR = os.environ.get("TPU_KNN_DATA_CACHE", "/tmp/tpu_knn_cache")
N, NQ = 1_000_000, 512


def emit(**kw):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def host_counts(corpus, q, radius):
    """f64 oracle: per-query (strict_inside, boundary_band) counts."""
    band = 1e-3 * radius + 1e-4
    lo = np.zeros(len(q), np.int64)
    hi = np.zeros(len(q), np.int64)
    cs = (corpus.astype(np.float64) ** 2).sum(1)
    for base in range(0, len(corpus), 100_000):
        x = corpus[base : base + 100_000].astype(np.float64)
        g = q.astype(np.float64) @ x.T
        dd = (q.astype(np.float64) ** 2).sum(1)[:, None] + cs[None, base : base + x.shape[0]] - 2 * g
        dd = np.sqrt(np.maximum(dd, 0.0))  # the l2 space returns EUCLIDEAN distance
        lo += (dd <= radius - band).sum(1)
        hi += (dd <= radius + band).sum(1)
    return lo, hi


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    try:
        pts = sift_like(N + NQ, d=128, seed=0)
        corpus, q = pts[:N], pts[N : N + NQ]
        idx = Index("l2", Params(dim=128), method="seq_search")
        idx.add_dense_batch(corpus)
        idx.build_index()
        # probe: kNN distances set radii at ~1 / ~10 / ~100 expected hits
        d, _ = idx.knn_query_batch(q, 100)
        d = np.asarray(d)
        radii = [float(np.median(d[:, 0])), float(np.median(d[:, 9])),
                 float(np.median(d[:, 99]))]
        emit(kind="radii", values=[round(r, 4) for r in radii])

        vp = Index("l2", Params(dim=128), method="vptree")
        vp.add_dense_batch(corpus)
        t0 = time.perf_counter()
        vp.build_index(Params(bucketSize=64))
        emit(kind="vptree_build", wall_s=round(time.perf_counter() - t0, 1))

        for r in radii:
            # f64 oracle counts (cached per radius)
            cpath = os.path.join(GOLD_DIR, f"range1m_counts_{r:.4f}.npz")
            if os.path.exists(cpath):
                z = np.load(cpath)
                lo, hi = z["lo"], z["hi"]
            else:
                lo, hi = host_counts(corpus, q, r)
                os.makedirs(GOLD_DIR, exist_ok=True)
                np.savez(cpath, lo=lo, hi=hi)
            for name, ix in (("seq_range", idx), ("vptree_range", vp)):
                res = ix.range_query_batch(q, r)  # compile + warm
                t0 = time.perf_counter()
                res = ix.range_query_batch(q, r)
                dt = time.perf_counter() - t0
                sizes = np.array([len(one.ids) for one in res])
                ok_lo = int((sizes >= lo).sum())
                ok_hi = int((sizes <= hi).sum())
                emit(kind=name, radius=round(r, 4), qps=round(NQ / dt, 1),
                     mean_hits=round(float(sizes.mean()), 1),
                     max_hits=int(sizes.max()),
                     n_below_oracle=NQ - ok_lo, n_above_oracle=NQ - ok_hi)
    except Exception:
        emit(kind="crash", err=traceback.format_exc()[-700:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
