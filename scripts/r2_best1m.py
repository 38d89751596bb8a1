"""Flagship 1M dense rows under ONE process (tunnel drift cancels):
the best-known build config (constructionStore default + efC=64, the
quality-equal tune point) vs the canonical efC=100, each with a full
int8-neighbor-store query sweep. These are the rows the README's
head-to-head table should carry for construction + serving.

Usage: r2_best1m.py   — appends JSON to /tmp/r2_best1m.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_best1m.jsonl"
NQ, K = 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    gpath = "/tmp/gold_sift1m_l2.npz"
    pts = sift_like(1_002_048, 128, seed=0)
    corpus, q = pts[:1_000_000], pts[1_000_000:]
    try:
        if not os.path.exists(gpath):
            ex = Index("l2", Params(dim=128), method="seq_search")
            ex.add_dense_batch(corpus)
            ex.build_index()
            _, gi = ex.knn_query_batch(q, K)
            np.savez(gpath, ids=np.asarray(gi))
            del ex
        gold = np.load(gpath)["ids"]
        for tag, efc in (("wave_c64", 64), ("wave_c100", 100)):
            idx = Index("l2", Params(dim=128), method="hnsw")
            idx.add_dense_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(M=16, efConstruction=efc,
                                   waveSize=1024, constructionExpand=4,
                                   replicateNeighbors=1,
                                   nbrStoreDtype="int8"))
            float(jnp.sum(idx.method.graph["level0"]))
            build_s = time.perf_counter() - t0
            sweep = []
            for ef in (10, 14, 20, 50):
                idx.set_query_time_params(Params(efSearch=ef))
                d, i = idx.knn_query_batch(q, K)  # warm (store build + jit)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                dt = time.perf_counter() - t0
                rec = float(np.mean([
                    len(set(a[a >= 0]) & set(b)) / K
                    for a, b in zip(i, gold)
                ]))
                sweep.append({"ef": ef, "qps": round(NQ / dt, 1),
                              "recall": round(rec, 4)})
            emit(tag=tag, efc=efc, build_s=round(build_s, 1), sweep=sweep)
            del idx
    except Exception:
        emit(event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
