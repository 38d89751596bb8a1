"""Pipelined async queries vs sync loop, on the chip.

knn_query_batch_async dispatches the packed search and defers the
result download, so batch n+1's upload/compute overlaps batch n's
download — on a remote-device link the per-batch wall is ~2x device
time in round trips (r2_wall.jsonl), which pipelining should hide.
Measures wall qps for the same 2048 queries as 4x512 batches, sync vs
async-pipelined, dense (100k l2 hnsw int8 store) and sparse (100k
cosine exact traversal). Results are pinned equal between modes first.

Appends JSON to /tmp/r2_async.jsonl.
"""

import json
import time
import traceback

import numpy as np

LOG = "/tmp/r2_async.jsonl"
N, NQ, K, NB = 100_000, 2048, 10, 4


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def ab(idx, q, tag, **kw):
    bs = NQ // NB
    batches = [q[i * bs:(i + 1) * bs] for i in range(NB)]

    def sync_all():
        return [idx.knn_query_batch(b, K) for b in batches]

    def async_all():
        futs = [idx.knn_query_batch_async(b, K) for b in batches]
        return [f.result() for f in futs]

    r_s = sync_all()  # warm at the exact shape + reference results
    r_a = async_all()
    same = all(
        np.array_equal(ia, is_) for (_, is_), (_, ia) in zip(r_s, r_a)
    )
    t0 = time.perf_counter()
    sync_all()
    dt_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    async_all()
    dt_a = time.perf_counter() - t0
    emit(kind=tag, sync_qps=round(NQ / dt_s, 1), async_qps=round(NQ / dt_a, 1),
         speedup=round(dt_s / dt_a, 2), ids_equal=bool(same), **kw)


def main():
    global NQ, NB
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sift_like, sparse_like

    try:
        pts = sift_like(N + NQ, d=128, seed=0)
        idx = Index("l2", Params(dim=128), method="hnsw")
        idx.add_dense_batch(pts[:N])
        idx.build_index(Params(M=16, replicateNeighbors=1, nbrStoreDtype="int8"))
        for ef in (20, 50):
            idx.set_query_time_params(Params(efSearch=ef, searchExpand=4))
            ab(idx, pts[N:], "dense", ef=ef)

        spts = sparse_like(N + 512, vocab=30_000, nnz=64, seed=0)
        sidx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        sidx.add_sparse_batch(spts[:N])
        sidx.build_index(Params(M=16, efConstruction=50, waveSize=1024,
                                sketchQuery=1, exactBase=0, exactPairs=0))
        sidx.method.sketch_query = 0
        NQ, NB = 512, 4
        for ef in (50, 100):
            sidx.set_query_time_params(Params(efSearch=ef))
            ab(sidx, spts[N:], "sparse", ef=ef)
    except Exception:
        emit(kind="crash", err=traceback.format_exc()[-800:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
