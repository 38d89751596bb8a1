"""Sparse-1M serving shot (VERDICT r4 items 1-2 of "What's missing"):
candidate-gathered NAPP rerank (invProcAlg=gather) vs the fused masked
scan at 1M bag-of-words, on chip.

r4 facts (bench_results/r4_sparse.jsonl napp1m): numPivot=2048/npfx=32
holds recall 0.9773 @ nps=16/mt=2 with 58.7k cand/q, but the fused
rescan pins ~330 qps at every candidate count because it scores the
whole corpus and masks. The gather engine bounds a candidate-
proportional rerank at ~900 qps for that candidate count (BASELINE.md
granule-rate roofline). Target: >800 qps at recall >= 0.95 — above the
exact scan's 687 qps ceiling — or a written roofline negative.

Gold is host-f64 (scripts/sparse_gold.py; NEVER a device scan) and now
caches into the repo (bench_results/gold/) so VM wipes stop costing a
recompute. Emits bench_results/r5_napp1m.jsonl.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
LOG = os.path.join(REPO, "bench_results", "r5_napp1m.jsonl")
GOLD_DIR = os.path.join(REPO, "bench_results", "gold")
K = 10


def emit(**kw):
    kw["t"] = round(time.time(), 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


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


def recall_vs(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b)) / K for a, b in zip(np.asarray(ids), gold)
    ]))


def main():
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.eval.datasets import sparse_like
    from tpu_knn.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    nq, n, vocab = 512, 1_000_000, 60_000
    pts = sparse_like(n + nq, vocab=vocab, nnz=64, seed=0)
    gold = f64_gold(pts, n, nq, vocab, "gold_sparse1m_v60k.npz")
    emit(stage="napp1m_gather", event="gold_ok", n=n, nq=nq)

    t0 = time.perf_counter()
    idx = Index("cosinesimil_sparse", method="napp", data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    idx.build_index(Params(numPivot=2048, numPrefix=32))
    emit(stage="napp1m_gather", event="build_ok",
         build_s=round(time.perf_counter() - t0, 1))

    queries = pts[n:]
    # arms: the two ~59k-candidate operating points from r4 (0.9773 and
    # 0.967 recall under the fused scan) x budget fracs; fused control
    # re-measured last for the same-session comparison
    arms = [
        ("gather", dict(numPrefixSearch=16, minTimes=2, invProcAlg="gather",
                        dbScanFrac=0.08)),
        ("gather", dict(numPrefixSearch=16, minTimes=2, invProcAlg="gather",
                        dbScanFrac=0.12)),
        ("gather", dict(numPrefixSearch=16, minTimes=2, invProcAlg="gather",
                        dbScanFrac=0.06)),
        ("gather", dict(numPrefixSearch=32, minTimes=3, invProcAlg="gather",
                        dbScanFrac=0.08)),
        # the high-recall point: 164k cand needs a bigger budget
        ("gather", dict(numPrefixSearch=32, minTimes=2, invProcAlg="gather",
                        dbScanFrac=0.22)),
        ("fused", dict(numPrefixSearch=16, minTimes=2, invProcAlg="scan")),
        ("fused", dict(numPrefixSearch=32, minTimes=2, invProcAlg="scan")),
    ]
    for tag, qp in arms:
        try:
            idx.set_query_time_params(Params(**qp))
            idx.knn_query_batch(queries, K)  # compile+warm
            idx.method.dist_comps = 0
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _, ids = idx.knn_query_batch(queries, K)
                dt = min(dt, time.perf_counter() - t0)
            emit(stage="napp1m_gather", arm=tag, **qp,
                 qps=round(nq / dt, 1),
                 recall_at_10=round(recall_vs(ids, gold), 4),
                 cand_per_q=int(idx.method.dist_comps / (3 * nq)))
        except Exception as e:
            emit(stage="napp1m_gather", arm=tag, **qp, error=repr(e)[:300])
    emit(stage="napp1m_gather", event="done")
    del idx
    taat_latency(pts, n)


def taat_latency(pts, n):
    """qpack TAAT small-batch latency (VERDICT r4 item 6 'Done'): the
    packed single-upload/single-download path vs the eager path at
    nq=1/8/32 on the 1M corpus — r4 measured 99 ms wall at nq=1 against
    a ~5-10 ms device dispatch, ~90% transport."""
    from tpu_knn import DataKind, Index, Params
    from tpu_knn.ops import qpack as Q

    idx = Index("negdotprod_sparse_fast", method="simple_invindx",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(pts[:n])
    idx.build_index()
    for packed in (True, False):
        Q.PACKED_QUERIES = packed
        for nq in (1, 8, 32):
            qs = pts[n : n + nq]
            try:
                idx.knn_query_batch(qs, K)  # compile+warm this plan shape
                dt = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    idx.knn_query_batch(qs, K)
                    dt = min(dt, time.perf_counter() - t0)
                emit(stage="taat_latency", packed=packed, nq=nq,
                     wall_ms=round(dt * 1e3, 2),
                     qps=round(nq / dt, 1))
            except Exception as e:
                emit(stage="taat_latency", packed=packed, nq=nq,
                     error=repr(e)[:300])
    Q.PACKED_QUERIES = True
    emit(stage="taat_latency", event="done")


if __name__ == "__main__":
    main()
