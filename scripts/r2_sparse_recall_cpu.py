"""Isolate the sparse-HNSW recall gap vs the reference (CPU backend).

Reference on the same 4k bag-of-words data: 0.79/0.94/0.98/0.99 @
ef 20/50/100/200 (scripts/ref_baseline/run_sparse.py 4000). Build ours
with the sketch-proxy and the pure-exact wave paths and sweep ef wide —
if even ef=1000 can't reach the reference's ef=100 point, the GRAPH is
deficient; if ef=1000 recovers, the TRAVERSAL/beam is.
"""

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from tpu_knn import Index, Params
from tpu_knn.core.dataset import DataKind
from tpu_knn.eval.datasets import sparse_like

N, NQ, K = 4000, 512, 10


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    ex = Index("cosinesimil_sparse", method="seq_search", data_type=DataKind.SPARSE)
    ex.add_sparse_batch(corpus)
    _, gold = ex.knn_query_batch(q, K)
    gold = np.asarray(gold)

    variants = [
        ("sketch_exact_pairs", dict(M=16, efConstruction=100, waveSize=256)),
        ("sketch_ep_efc200", dict(M=16, efConstruction=200, waveSize=256)),
        ("sketch_hybrid", dict(M=16, efConstruction=100, waveSize=256, exactPairs=0)),
        ("exact_build", dict(M=16, efConstruction=100, waveSize=256, sketchDim=0)),
    ]
    import os
    only = os.environ.get("ONLY")
    if only:
        variants = [v for v in variants if v[0] == only]
    for name, params in variants:
        idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        idx.add_sparse_batch(corpus)
        t0 = time.perf_counter()
        idx.build_index(Params(**params))
        emit(variant=name, event="build_ok", build_s=round(time.perf_counter() - t0, 1))
        for ef in (20, 50, 100, 200, 1000):
            idx.set_query_time_params(Params(efSearch=ef))
            _, i = idx.knn_query_batch(q, K)
            i = np.asarray(i)
            rec = float(np.mean([
                len(set(a[a >= 0]) & set(b)) / K for a, b in zip(i, gold)
            ]))
            emit(variant=name, ef=ef, recall_at_10=round(rec, 4))


if __name__ == "__main__":
    main()
