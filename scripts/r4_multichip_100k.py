"""Moderate-scale multi-chip artifact (VERDICT r3 'do this' #6): one
8-device CPU-mesh run at 100k — sharded exact kNN + ShardedHnsw vs the
single-device paths: recall parity and per-shard timing, appended to
bench_results/r4_multichip.jsonl.

NB: the virtual CPU mesh shares ONE physical core, so absolute walls
mean nothing and "speedup" cannot be observed here — what this
validates at a scale the unit tests don't reach (n=64*S) is CORRECTNESS
of the sharded programs at 100k (exactness of the two-tier merge,
recall parity of the stacked-subgraph search) plus the per-shard work
accounting. SURVEY §7 step 9: "recall parity tests with the 1-chip
path using forced multi-device CPU".

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/r4_multichip_100k.py [n]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/bench_results/r4_multichip.jsonl"


def emit(**row):
    row["t"] = time.time()
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8, jax.devices()
    import numpy as np

    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nq, k = 512, 10
    x = sift_like(n + nq, 128, seed=0)
    corpus, queries = x[:n], x[n : n + nq]

    # ---- single-device exact gold ----
    ex = Index("l2", Params(dim=128), method="seq_search")
    ex.add_dense_batch(corpus)
    t0 = time.time()
    ed, eids = ex.knn_query_batch(queries, k)
    emit(stage="exact_single", n=n, wall_s=round(time.time() - t0, 2))

    # ---- sharded exact over the 8-device mesh ----
    sx = Index("l2", Params(dim=128), method="seq_search", mesh=8)
    sx.add_dense_batch(corpus)
    sx.build_index()
    t0 = time.time()
    sd, sids = sx.knn_query_batch(queries, k)
    wall = time.time() - t0
    # the sharded exact scan must be EXACT: identical id sets, distances
    # to f32 reduction tolerance
    same = float(np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / k for a, b in zip(sids, eids)
    ]))
    dmax = float(np.nanmax(np.abs(
        np.where(np.isfinite(sd), sd, 0) - np.where(np.isfinite(ed), ed, 0))))
    emit(stage="exact_sharded", n=n, devices=8, wall_s=round(wall, 2),
         id_parity=round(same, 6), max_dist_delta=dmax)
    assert same == 1.0, same

    # ---- single-device HNSW (wave build, the sharded builder's algo) ----
    # efC=50 + waveSize=2048: the virtual mesh shares ONE physical core,
    # so the build params are chosen for CPU feasibility at 100k — the
    # parity claim only needs both arms built identically
    bp = Params(M=16, efConstruction=50, waveSize=2048)
    h1 = Index("l2", Params(dim=128), method="hnsw")
    h1.add_dense_batch(corpus)
    t0 = time.time()
    h1.build_index(bp)
    b1 = time.time() - t0
    rows1 = {}
    for ef in (10, 20, 50):
        h1.set_query_time_params(Params(efSearch=ef))
        _, ids = h1.knn_query_batch(queries, k)
        rows1[ef] = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / k for a, b in zip(ids, eids)]))
    emit(stage="hnsw_single", n=n, build_s=round(b1, 1),
         recall={str(e): round(r, 4) for e, r in rows1.items()})

    # ---- ShardedHnsw: all-shards-simultaneous wave build ----
    h8 = Index("l2", Params(dim=128), method="hnsw", mesh=8)
    h8.add_dense_batch(corpus)
    t0 = time.time()
    h8.build_index(bp)
    b8 = time.time() - t0
    rows8 = {}
    for ef in (10, 20, 50):
        h8.set_query_time_params(Params(efSearch=ef))
        _, ids = h8.knn_query_batch(queries, k)
        rows8[ef] = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / k for a, b in zip(ids, eids)]))
    emit(stage="hnsw_sharded", n=n, devices=8, build_s=round(b8, 1),
         recall={str(e): round(r, 4) for e, r in rows8.items()})

    # parity verdict: the stacked 8-subgraph search merges 8 local
    # top-k's — with 1/8th-corpus subgraphs its recall should match or
    # beat the single-graph at equal ef (more total beam work)
    ok = all(rows8[e] >= rows1[e] - 0.01 for e in rows1)
    emit(stage="verdict", n=n, parity_ok=bool(ok),
         single={str(e): round(r, 4) for e, r in rows1.items()},
         sharded={str(e): round(r, 4) for e, r in rows8.items()})


if __name__ == "__main__":
    main()
