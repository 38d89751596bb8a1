"""Packed query transport A/B on the chip: wall qps packed vs eager.

Dense: 100k SIFT-like l2, M=16, int8 nbr store, ef=20/50, 2048 queries
(batch16 attribution: device 30.4 ms, wall 189.9 — ~160 ms of round
trips at stake). Sparse: 100k cosinesimil_sparse pure-proxy build,
exact traversal ef=50/100, 512 queries (wall 171 vs device 57 ms).
Both verify packed ids == eager ids before timing.

Appends JSON to /tmp/r2_qpack.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_qpack.jsonl"
N, NQ, K = 100_000, 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def timed(idx, q, reps=3):
    d, i = idx.knn_query_batch(q, K)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        d, i = idx.knn_query_batch(q, K)
    dt = (time.perf_counter() - t0) / reps
    return dt, i


def ab(idx, q, tag, **kw):
    from tpu_knn.ops import qpack as Q

    Q.PACKED_QUERIES = True
    dt_p, i_p = timed(idx, q)
    Q.PACKED_QUERIES = False
    dt_e, i_e = timed(idx, q)
    Q.PACKED_QUERIES = True
    emit(kind=tag, packed_ms=round(dt_p * 1e3, 1), eager_ms=round(dt_e * 1e3, 1),
         packed_qps=round(len(q) / dt_p, 1), eager_qps=round(len(q) / dt_e, 1),
         ids_equal=bool(np.array_equal(i_p, i_e)), **kw)


def main():
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sift_like, sparse_like

    try:
        pts = sift_like(N + NQ, d=128, seed=0)
        corpus, q = pts[:N], pts[N : N + NQ]
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(corpus)
        idx.build_index(Params(M=16, replicateNeighbors=1, nbrStoreDtype="int8"))
        for ef in (20, 50):
            idx.set_query_time_params(Params(efSearch=ef, searchExpand=4))
            ab(idx, q, "dense", ef=ef)

        spts = sparse_like(N + 512, vocab=30_000, nnz=64, seed=0)
        sc, sq = spts[:N], spts[N:]
        sidx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        sidx.add_sparse_batch(sc)
        sidx.build_index(Params(M=16, efConstruction=50, waveSize=1024,
                                sketchQuery=1, exactBase=0, exactPairs=0))
        sidx.method.sketch_query = 0
        for ef in (50, 100):
            sidx.set_query_time_params(Params(efSearch=ef))
            ab(sidx, sq, "sparse", ef=ef)
    except Exception:
        emit(kind="crash", err=traceback.format_exc()[-800:])
        raise


if __name__ == "__main__":
    main()
