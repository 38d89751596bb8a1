"""1M-corpus exact range queries on the chip — the round-1 VERDICT's
"Done =" criterion for item 8 (streamed range: device memory stays
O(Q*(cap+chunk)), never [Q, N]; methods/seq_search.py range).

Radii are taken from the k-NN distance quantiles of a 512-query probe
so the result sizes span ~1 / ~10 / ~100 hits per query. Emits wall
qps + mean result size per radius to /tmp/r2_range1m.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_range1m.jsonl"
N, NQ = 1_000_000, 512


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

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
        for r in radii:
            res = idx.range_query_batch(q, r)  # compile + warm
            t0 = time.perf_counter()
            res = idx.range_query_batch(q, r)
            dt = time.perf_counter() - t0
            sizes = [len(one.ids) for one in res]
            emit(kind="range", radius=round(r, 4), qps=round(NQ / dt, 1),
                 mean_hits=round(float(np.mean(sizes)), 1),
                 max_hits=int(np.max(sizes)))
    except Exception:
        emit(kind="crash", err=traceback.format_exc()[-700:])
        raise


if __name__ == "__main__":
    main()
