"""Post-densify-fix retest of the EXACT (non-proxy) sparse HNSW build
on TPU. The round-1 host-space wave program faulted the TPU worker even
at 10k docs; the densify scatter UB (fixed in c169090) is a plausible
root cause — undefined behavior can crash a lowering, not just
miscompile it. If this now runs fault-free, the sketch proxy becomes an
optimization choice instead of a stability workaround (and its recall
can be compared against the exact build at 100k directly).

Stages: 20k build+query first (cheap canary), then 100k. Appends JSON
lines to /tmp/r2_sexact.jsonl.
"""

import json
import os
import time
import traceback

import numpy as np

LOG = "/tmp/r2_sexact.jsonl"
NQ, K = 512, 10


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
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts_all = sparse_like(100_000 + NQ, vocab=30_000, nnz=64, seed=0)

    for n in (20_000, 100_000):
        corpus, q = pts_all[:n], pts_all[100_000 : 100_000 + NQ]
        gpath = f"/tmp/sparse_gold_exact_{n}.npz"
        if os.path.exists(gpath):
            gold = np.load(gpath)["ids"]
        else:
            ex = Index("cosinesimil_sparse", method="seq_search",
                       data_type=DataKind.SPARSE)
            ex.add_sparse_batch(corpus)
            ex.build_index()
            _, gold = ex.knn_query_batch(q, K)
            gold = np.asarray(gold)
            np.savez(gpath, ids=gold)
            del ex
        try:
            idx = Index("cosinesimil_sparse", method="hnsw",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(corpus)
            t0 = time.perf_counter()
            # sketchDim=0: host-space wave build, the formulation that
            # faulted the worker pre-fix
            idx.build_index(Params(M=16, efConstruction=100,
                                   waveSize=512, sketchDim=0))
            sync(idx.method.graph["level0"])  # surface async faults NOW
            build_s = round(time.perf_counter() - t0, 1)
            emit(event="exact_build_ok", n=n, build_s=build_s)
            for ef in (50, 100, 200):
                idx.set_query_time_params(Params(efSearch=ef))
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                rec = float(np.mean([
                    len(set(a[a >= 0]) & set(b)) / K
                    for a, b in zip(np.asarray(i), gold)
                ]))
                emit(n=n, ef=ef, qps=round(NQ / dt, 1),
                     recall_at_10=round(rec, 4),
                     at=time.strftime("%H:%M:%S"))
            del idx
        except Exception:
            emit(event="exact_build_fail", n=n,
                 err=traceback.format_exc()[-600:])


if __name__ == "__main__":
    main()
