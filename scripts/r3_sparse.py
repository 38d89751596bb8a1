"""Round-3 sparse HNSW quality repair measurements (VERDICT r2 item 2).

Background: the sketch-proxy 1M build collapses (recall@10 0.138-0.763)
because JL sketches can't rank bag-of-words near-ties; the reference
builds with exact distances at every scale (hnsw.cc:183-470). The raw
exact sparse wave program faulted the TPU worker in ROUND 1 — but that
predates the round-2 scatter-hint miscompile fix (hinted scatters
return wrong results in 16-row bands on this backend and were removed
everywhere), so the first question is whether the exact wave build
is simply fine now.

Stages (argv[1]):
  probe   — raw exact wave builds (sketchDim=0) at 10k/50k/100k on
            chip: fault-or-not, build wall, recall vs host-f64 gold.
  exact1m — 1M exact wave build (vocab=60k rows) + ef sweep, if the
            probe passes. Anchors: exact scan 401 qps @ 1.0; NAPP
            340 @ 0.974; sketch-proxy HNSW recall-collapsed.
  gold1m  — just precompute the host-f64 1M gold (CPU, run separately).

Durable outputs: bench_results/r3_sparse.jsonl (repo-local).
"""

import json
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
LOG = os.path.join(REPO, "bench_results", "r3_sparse.jsonl")
GOLD_DIR = os.environ.get("TPU_KNN_DATA_CACHE", "/tmp/tpu_knn_cache")
K = 10


def emit(**kw):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def sync(idx):
    import jax.numpy as jnp

    float(jnp.sum(idx.method.graph["level0"]))


def f64_gold(pts, n, nq, vocab, name):
    from sparse_gold import host_f64_gold

    os.makedirs(GOLD_DIR, exist_ok=True)
    path = os.path.join(GOLD_DIR, name)
    if os.path.exists(path):
        return np.load(path)["ids"]
    t0 = time.perf_counter()
    gold = host_f64_gold(pts[:n], pts[n : n + nq], k=K, vocab=vocab)
    emit(event="gold_built", name=name, wall_s=round(time.perf_counter() - t0, 1))
    np.savez(path, ids=gold)
    return gold


def build_and_sweep(pts, n, nq, gold, tag, efs, build_params, vocab):
    from tpu_knn import DataKind, Index, Params

    q = pts[n : n + nq]
    t0 = time.perf_counter()
    idx = Index("cosinesimil_sparse", method="hnsw", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    idx.build_index(Params(**build_params))
    sync(idx)
    bs = round(time.perf_counter() - t0, 1)
    chk = idx.method.check_graph()
    emit(tag=tag, event="build_ok", build_s=bs,
         **{k: int(v) for k, v in chk.items()})
    for ef in efs:
        idx.set_query_time_params(Params(efSearch=ef))
        d, i = idx.knn_query_batch(q, K)
        t0 = time.perf_counter()
        d, i = idx.knn_query_batch(q, K)
        dt = time.perf_counter() - t0
        rec = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(i), gold)
        ]))
        emit(tag=tag, ef=ef, qps=round(len(q) / dt, 1),
             recall_at_10=round(rec, 4))
    del idx
    return bs


def stage_probe():
    from tpu_knn.eval.datasets import sparse_like

    nq = 512
    pts = sparse_like(100_000 + nq, vocab=30_000, nnz=64, seed=0)
    for n in (10_000, 50_000, 100_000):
        gold = f64_gold(pts[:n] + pts[100_000:], n, nq, 30_000,
                        f"gold_sparse{n}_v30k.npz")
        emit(stage="probe", n=n, event="gold_ok")
        # raw exact wave build: no proxy; exactBase/exactPairs are
        # no-ops without a proxy (single scoring space)
        build_and_sweep(
            pts[:n] + pts[100_000:], n, nq, gold, f"exactwave_{n}",
            (20, 50, 100), dict(M=16, efConstruction=100, waveSize=512,
                                sketchDim=0), 30_000)


def stage_repair():
    # 100k A/B: proxy-only build vs proxy + exactPost repair passes.
    # Anchor: proxy-only 100k scored 0.74 @ ef=100 (NAPP 0.93).
    from tpu_knn.eval.datasets import sparse_like

    nq = 512
    n = 100_000
    pts = sparse_like(n + nq, vocab=30_000, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, 30_000, "gold_sparse100000_v30k.npz")
    emit(stage="repair", event="gold_ok")
    for tag, bp in (
        ("proxy_ep0", dict(M=16, efConstruction=100, waveSize=1024,
                           exactPost=0)),
        ("proxy_ep1", dict(M=16, efConstruction=100, waveSize=1024,
                           exactPost=1)),
        ("proxy_ep2", dict(M=16, efConstruction=100, waveSize=1024,
                           exactPost=2)),
    ):
        build_and_sweep(pts, n, nq, gold, tag, (20, 50, 100), bp, 30_000)


def stage_exact1m():
    from tpu_knn.eval.datasets import sparse_like

    nq = 512
    n = 1_000_000
    pts = sparse_like(n + nq, vocab=60_000, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, 60_000, "gold_sparse1m_v60k.npz")
    emit(stage="exact1m", event="gold_ok")
    # proxy build + exactPost repair (the production default candidate)
    build_and_sweep(
        pts, n, nq, gold, "repair_1m", (20, 50, 100, 200),
        dict(M=16, efConstruction=100, waveSize=1024), 60_000)


def stage_gold1m():
    from tpu_knn.eval.datasets import sparse_like

    nq = 512
    n = 1_000_000
    pts = sparse_like(n + nq, vocab=60_000, nnz=64, seed=0)
    f64_gold(pts, n, nq, 60_000, "gold_sparse1m_v60k.npz")
    emit(stage="gold1m", event="done")


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "probe"
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    try:
        {"probe": stage_probe, "repair": stage_repair,
         "exact1m": stage_exact1m, "gold1m": stage_gold1m}[stage]()
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-900:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
