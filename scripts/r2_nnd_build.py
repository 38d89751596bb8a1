"""NN-descent build measurement (buildAlgo=nndescent vs the wave build).

Stages (argv[1]):
  300k  — synced build time + recall sweep at 300k SIFT-like vs an
          exact-scan gold; anchor: the synced wave build measured
          208.7 s (expand=4, r2_btune) at recall@10 0.9848 (ef=50...).
  tune  — small knob matrix at 300k (nndK x nndIters).
  1m    — full 1M build + int8-store ef sweep (mirrors
          r2_build1m_confirm): anchors 774-1,031 s wave build,
          23.5k qps @ 0.968 at ef=14, reference 231 s/core.

Appends JSON to /tmp/r2_nnd.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_nnd.jsonl"
NQ, K = 2048, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def sync(idx):
    import jax.numpy as jnp

    float(jnp.sum(idx.method.graph["level0"]))


def gold_ids(corpus, q, cache):
    from tpu_knn import Index, Params

    if os.path.exists(cache):
        return np.load(cache)["ids"]
    ex = Index("l2", Params(dim=128), method="seq_search")
    ex.add_dense_batch(corpus)
    ex.build_index(Params())
    _, gi = ex.knn_query_batch(q, K)
    np.savez(cache, ids=np.asarray(gi))
    del ex
    return np.load(cache)["ids"]


def build_and_sweep(corpus, q, gold, tag, efs, build_params):
    from tpu_knn import Index, Params

    t0 = time.perf_counter()
    idx = Index("l2", Params(dim=128), method="hnsw")
    idx.add_dense_batch(corpus)
    idx.build_index(Params(**build_params))
    sync(idx)
    bs = round(time.perf_counter() - t0, 1)
    chk = idx.method.check_graph()
    emit(tag=tag, event="build_ok", build_s=bs, **{k: int(v) for k, v in chk.items()})
    for ef in efs:
        idx.set_query_time_params(Params(efSearch=ef))
        d, i = idx.knn_query_batch(q, K)
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        dt = time.perf_counter() - t0
        rec = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / K for a, b in zip(i, gold)
        ]))
        emit(tag=tag, ef=ef, qps=round(len(q) / dt, 1),
             recall_at_10=round(rec, 4))
    del idx


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "300k"
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(1_002_048, 128, seed=0)
    q = pts[1_000_000:]
    try:
        if stage == "300k":
            corpus = pts[:300_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift300k_l2.npz")
            emit(stage=stage, event="gold_ok")
            build_and_sweep(
                corpus, q, gold, "nnd300k", (10, 14, 20, 50),
                dict(M=16, efConstruction=100, buildAlgo="nndescent"),
            )
        elif stage == "300kprof":
            # phase attribution (nndProfile syncs serialize dispatch, so
            # these walls are upper bounds — use the plain 300k stage for
            # headline numbers)
            corpus = pts[:300_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift300k_l2.npz")
            build_and_sweep(
                corpus, q, gold, "nnd300k_prof", (20,),
                dict(M=16, efConstruction=100, buildAlgo="nndescent",
                     nndProfile=1),
            )
        elif stage == "tune":
            corpus = pts[:300_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift300k_l2.npz")
            for nk, it in ((32, 8), (48, 6), (64, 10)):
                build_and_sweep(
                    corpus, q, gold, f"nnd300k_k{nk}_i{it}", (14, 20),
                    dict(M=16, efConstruction=100, buildAlgo="nndescent",
                         nndK=nk, nndIters=it),
                )
        elif stage == "100k":
            # bench-scale A/B: does NND beat the wave build at 100k
            # (bench.py's corpus size)? Decides the buildAlgo=auto
            # threshold. Same process: nnd then waves.
            corpus = pts[:100_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift100k_l2.npz")
            emit(stage=stage, event="gold_ok")
            build_and_sweep(
                corpus, q, gold, "nnd100k", (10, 14, 20, 50),
                dict(M=16, efConstruction=100, buildAlgo="nndescent"),
            )
            build_and_sweep(
                corpus, q, gold, "wave100k", (10, 14, 20, 50),
                dict(M=16, efConstruction=100, waveSize=1024,
                     constructionExpand=4),
            )
        elif stage == "1mprof":
            # fault localization: nndProfile syncs after every phase AND
            # every prune_and_link sub-phase (pl_prune/pl_rev/pl_shrink) —
            # the batch39 1M crash surfaced at repair_reachability's adj
            # download, i.e. somewhere in [final_exact .. shrink] async
            corpus = pts[:1_000_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift1m_l2.npz")
            emit(stage=stage, event="gold_ok")
            build_and_sweep(
                corpus, q, gold, "nnd1m_prof", (14, 20),
                dict(M=16, efConstruction=100, buildAlgo="nndescent",
                     nndProfile=1, replicateNeighbors=1,
                     nbrStoreDtype="int8"),
            )
        elif stage == "1mslots":
            # bypass arm: rev_mode=slots skips _rev_nearest+_shrink_sweep
            # (uses the proven-at-1M _make_b machinery)
            corpus = pts[:1_000_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift1m_l2.npz")
            emit(stage=stage, event="gold_ok")
            build_and_sweep(
                corpus, q, gold, "nnd1m_slots", (14, 20, 50),
                dict(M=16, efConstruction=100, buildAlgo="nndescent",
                     nndRevMode="slots", replicateNeighbors=1,
                     nbrStoreDtype="int8"),
            )
        else:
            corpus = pts[:1_000_000]
            gold = gold_ids(corpus, q, "/tmp/gold_sift1m_l2.npz")
            emit(stage=stage, event="gold_ok")
            build_and_sweep(
                corpus, q, gold, "nnd1m", (10, 14, 20, 50),
                dict(M=16, efConstruction=100, buildAlgo="nndescent",
                     replicateNeighbors=1, nbrStoreDtype="int8"),
            )
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
