"""Sparse-HNSW quality/speed sweep on TPU (round 2, after the
sketch-proxy fix made 100k builds stable).

Usage: python scripts/r2_sparse_quality.py <stage>
  base:  efC=100 M=16  — exact-traversal + sketch-traversal sweeps
  big:   efC=200 M=32  — ditto (does construction effort buy recall?)
  scan:  exact-scan qps A/B: densified-query gather vs corpus-densify
Appends JSON lines to /tmp/r2_squality.jsonl. Run stages in separate
processes.
"""

import json
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_squality.jsonl"
N, NQ, K = 100_000, 512, 10


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


def recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ]))


def main():
    stage = sys.argv[1]
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    # exact gold, recomputed when the /tmp cache is gone (VM reboots):
    # same path/params as r2_sparse_stage.gold_for
    import os

    gpath = f"/tmp/sparse_gold_{N}.npz"
    if os.path.exists(gpath):
        gold = np.load(gpath)["ids"]
    else:
        # HOST f64 truth, never a device self-gold (see sparse_gold.py).
        from sparse_gold import host_f64_gold

        gold = host_f64_gold(corpus, q, k=K, vocab=30_000)
        np.savez(gpath, ids=gold)

    try:
        if stage == "scan":
            import tpu_knn.methods.seq_search as SS
            import jax

            for flag in (True, False):
                SS.SPARSE_SCAN_QDENSE = flag
                jax.clear_caches()
                ex = Index("cosinesimil_sparse", method="seq_search",
                           data_type=DataKind.SPARSE)
                ex.add_sparse_batch(corpus)
                ex.build_index()
                d, i = ex.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = ex.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                emit(stage="scan", qdense=flag, qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
            return

        # waveSize 256 for the big config: efC=200 + M=32 at waveSize=1024
        # blew the HBM compile estimate (the exact-refinement pair scoring
        # is O(W * C^2 * nnz) in lookup intermediates) — a quarter wave
        # bounds the peak at 4x less, trading build wall-clock only
        # big at wave=256 ran >1h without finishing (391 waves of
        # O(W*C^2*nnz) exact refinement; killed) — wave=512 halves the
        # dispatch count; base200 answers "does construction effort buy
        # recall" at ~2x the base build cost.
        efc, m, wave = {
            "big": (200, 32, 512),
            "base200": (200, 16, 1024),
        }.get(stage, (100, 16, 1024))
        idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
        idx.add_sparse_batch(corpus)
        t0 = time.perf_counter()
        # sketchQuery=1 at BUILD time keeps the JL proxy alive (default 0
        # drops it in _drop_wave_state, and then flipping the attribute
        # post-build silently falls back to the exact path — the sq=1
        # sweep would re-measure sq=0); toggling the attribute afterwards
        # is then a real A/B: sq=0 ignores the kept proxy.
        idx.build_index(Params(M=m, efConstruction=efc, waveSize=wave,
                               sketchQuery=1), print_progress=True)
        sync(idx.method.graph["level0"])
        emit(stage=stage, event="build_ok", M=m, efC=efc,
             build_s=round(time.perf_counter() - t0, 1))

        for sq, efs in ((0, (20, 50, 100, 200)), (1, (50, 100, 200, 400))):
            idx.method.sketch_query = sq
            for ef in efs:
                idx.set_query_time_params(Params(efSearch=ef))
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                sync(d)
                dt = time.perf_counter() - t0
                emit(stage=stage, sketch_query=sq, ef=ef,
                     qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-800:])
        sys.exit(2)


if __name__ == "__main__":
    main()
