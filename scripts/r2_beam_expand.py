"""Beam frontier-width sweep at LOW ef (the wall-qps fight vs the
reference is at ef=10-20, where per-iteration fixed cost dominates; the
earlier ef-scaled-expand measurement covered only ef=100-200). One TPU
session: build a 100k dense HNSW once, then sweep searchExpand x
replicateNeighbors at ef=20/50, profiler trace on the interesting
points. Appends JSON lines to /tmp/r2_beamx.jsonl.
"""

import json
import os
import time

import numpy as np

LOG = "/tmp/r2_beamx.jsonl"
N, D, Q, K = 100_000, 128, 2048, 10


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
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(N + Q, D, seed=0)
    x, q = pts[:N], pts[N : N + Q]

    gold_path = f"/tmp/gold_beam_{N}.npz"
    if os.path.exists(gold_path):
        gold = np.load(gold_path)["ids"]
    else:
        ex = Index("l2", Params(dim=D), method="seq_search")
        ex.add_dense_batch(x)
        _, gold = ex.knn_query_batch(q, K)
        gold = np.asarray(gold)
        np.savez(gold_path, ids=gold)

    def bench(idx, tag, ef, expand):
        idx.set_query_time_params(Params(efSearch=ef, searchExpand=expand))
        d, i = idx.knn_query_batch(q, K)  # compile + warm at the real shape
        sync(d)
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        sync(d)
        dt = time.perf_counter() - t0
        rec = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / K
            for a, b in zip(np.asarray(i), gold)
        ]))
        emit(tag=tag, ef=ef, expand=expand, qps=round(Q / dt, 1),
             recall_at_10=round(rec, 4), at=time.strftime("%H:%M:%S"))

    for store, tag in ((0, "plain"), (1, "nbrstore_bf16")):
        idx = Index("l2", Params(dim=D), method="hnsw")
        idx.add_dense_batch(x)
        t0 = time.perf_counter()
        idx.build_index(Params(M=16, efConstruction=200, waveSize=1024,
                               replicateNeighbors=store))
        sync(idx.method.graph["level0"])
        emit(event="build_ok", tag=tag, build_s=round(time.perf_counter() - t0, 1))
        for expand in (2, 4, 8):
            for ef in (20, 50):
                bench(idx, tag, ef, expand)
        del idx


if __name__ == "__main__":
    main()
