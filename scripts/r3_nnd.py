"""Round-3 NN-descent decision measurements (VERDICT r2 item 3).

Stages (argv[1]):
  glove — GloVe-1.2M cosine NND build + ef sweep. Anchors: our wave
          build 830.9 s synced / 14.7k qps @ 0.9742 (ef=14); the
          reference's normalize-once build 444.1 s (hnsw.cc:441-446) —
          the one remaining lost build headline.
  100k  — NND-vs-wave same-process A/B at bench scale (the
          buildAlgo=auto threshold decision, ex-batch46).
  u8    — l2sqr_sift u8[128] 1M NND build + ef sweep. Anchor: wave
          build 711 s, 12.7k qps @ 0.9898 (ef=20) (BASELINE.md).

Durable outputs: appends JSON lines to bench_results/r3_nnd.jsonl in
the repo (survives VM restarts, unlike the r2 /tmp logs the judge
could not verify). Datasets/golds cache under TPU_KNN_DATA_CACHE
(point it at <repo>/.datacache).
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "bench_results", "r3_nnd.jsonl")
GOLD_DIR = os.environ.get("TPU_KNN_DATA_CACHE", "/tmp/tpu_knn_cache")
NQ, K = 2048, 10


def emit(**kw):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def sync(idx):
    import jax.numpy as jnp

    float(jnp.sum(idx.method.graph["level0"]))


def gold_ids(mk_exact, q, cache):
    os.makedirs(GOLD_DIR, exist_ok=True)
    path = os.path.join(GOLD_DIR, cache)
    if os.path.exists(path):
        return np.load(path)["ids"]
    ex = mk_exact()
    _, gi = ex.knn_query_batch(q, K)
    np.savez(path, ids=np.asarray(gi))
    del ex
    return np.load(path)["ids"]


def sweep(idx, q, gold, tag, efs):
    from tpu_knn import Params

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


def build_and_sweep(mk_index, corpus_add, q, gold, tag, efs, build_params):
    from tpu_knn import Params

    t0 = time.perf_counter()
    idx = mk_index()
    corpus_add(idx)
    idx.build_index(Params(**build_params))
    sync(idx)
    bs = round(time.perf_counter() - t0, 1)
    chk = idx.method.check_graph()
    emit(tag=tag, event="build_ok", build_s=bs,
         **{k: int(v) for k, v in chk.items()})
    sweep(idx, q, gold, tag, efs)
    del idx


def stage_glove():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import glove_like

    n, d = 1_200_000, 100
    pts = glove_like(n + NQ, d, seed=0)
    corpus, q = pts[:n], pts[n:]

    def mk_exact():
        ex = Index("cosinesimil", Params(dim=d), method="seq_search")
        ex.add_dense_batch(corpus)
        ex.build_index()
        return ex

    gold = gold_ids(mk_exact, q, "gold_glove12m_cos.npz")
    emit(stage="glove", event="gold_ok")
    # two builds: r0 pays residual compile, r1 is the warm headline
    # (the reference's 444.1 s is an always-warm compiled binary)
    for rep in (0, 1):
        build_and_sweep(
            lambda: Index("cosinesimil", Params(dim=d), method="hnsw"),
            lambda idx: idx.add_dense_batch(corpus),
            q, gold, f"nnd_glove_r{rep}", (10, 14, 20, 50),
            dict(M=16, efConstruction=100, buildAlgo="nndescent"),
        )


def stage_100k():
    from tpu_knn import Index, Params
    from tpu_knn.eval.datasets import sift_like

    pts = sift_like(1_002_048, 128, seed=0)
    corpus, q = pts[:100_000], pts[1_000_000:]

    def mk_exact():
        ex = Index("l2", Params(dim=128), method="seq_search")
        ex.add_dense_batch(corpus)
        ex.build_index()
        return ex

    gold = gold_ids(mk_exact, q, "gold_sift100k_l2.npz")
    emit(stage="100k", event="gold_ok")
    for tag, bp in (
        ("nnd100k", dict(M=16, efConstruction=100, buildAlgo="nndescent")),
        ("wave100k", dict(M=16, efConstruction=100, waveSize=1024,
                          constructionExpand=4, buildAlgo="waves")),
    ):
        # two builds each: first pays any residual compile, second is the
        # warm number the auto threshold decision uses
        for rep in (0, 1):
            build_and_sweep(
                lambda: Index("l2", Params(dim=128), method="hnsw"),
                lambda idx: idx.add_dense_batch(corpus),
                q, gold, f"{tag}_r{rep}", (10, 14, 20, 50), bp,
            )


def stage_u8():
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind, DistKind
    from tpu_knn.eval.datasets import sift_like

    n = 1_000_000
    pts = sift_like(n + NQ, 128, seed=0)
    x8 = np.clip(np.round(pts), 0, 255).astype(np.uint8)
    corpus, q = x8[:n], x8[n:]

    def mk_exact():
        ex = Index("l2sqr_sift", method="seq_search",
                   data_type=DataKind.UINT8, dist_type=DistKind.INT)
        ex.add_uint8_batch(corpus)
        ex.build_index()
        return ex

    gold = gold_ids(mk_exact, q, "gold_siftu8_1m.npz")
    emit(stage="u8", event="gold_ok")
    build_and_sweep(
        lambda: Index("l2sqr_sift", method="hnsw",
                      data_type=DataKind.UINT8, dist_type=DistKind.INT),
        lambda idx: idx.add_uint8_batch(corpus),
        q, gold, "nnd_u8_1m", (14, 20, 50),
        dict(M=16, efConstruction=100, buildAlgo="nndescent"),
    )


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "glove"
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    try:
        {"glove": stage_glove, "100k": stage_100k, "u8": stage_u8}[stage]()
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
