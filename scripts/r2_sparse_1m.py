"""Sparse at 1M: exact-scan + NAPP scale demonstration (every sparse
row so far is 100k). cosinesimil_sparse, 1M bag-of-words docs, vocab
60k, nnz<=64, 512 queries.

Gold: the device exact scan — proven exact vs host f64 at 100k
(|dist - f64| ~5e-8, r2_srbisect + diag5) — with an f64 spot-check on
the first 32 queries here (host cost is O(32 * nnz * N), minutes).

Appends JSON to /tmp/r2_sparse1m.jsonl.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

LOG = "/tmp/r2_sparse1m.jsonl"
N, NQ, K, VOCAB = 1_000_000, 512, 10, 60_000


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def f64_check(corpus, q, ids, nq=32):
    """Host f64 cosine top-K for the first nq queries vs device ids.
    Fully vectorized (reduceat over the concatenated CSR stream): a
    per-point Python loop over 1M docs would take tens of minutes on
    this one-core box."""
    # sparse_like returns ragged (ids, vals) tuples (1-based ids)
    qd = np.zeros((nq, VOCAB + 2), np.float64)
    for i, (pid, pval) in enumerate(q[:nq]):
        qd[i, np.asarray(pid, np.int64)] = np.asarray(pval, np.float64)
        qd[i] /= max(np.linalg.norm(qd[i]), 1e-300)
    hits = 0
    step = 20_000
    best_d = np.full((nq, K), np.inf)
    best_i = np.full((nq, K), -1, np.int64)
    for s in range(0, len(corpus), step):
        blk = corpus[s : s + step]
        counts = np.asarray([len(pid) for pid, _ in blk])
        starts = np.zeros(len(blk), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        cid = np.concatenate([np.asarray(pid, np.int64) for pid, _ in blk])
        val = np.concatenate([np.asarray(pval, np.float64) for _, pval in blk])
        sq = np.add.reduceat(val * val, starts)
        val = val / np.repeat(np.maximum(np.sqrt(sq), 1e-300), counts)
        contrib = qd[:, cid] * val[None, :]  # [nq, E]
        dots = np.add.reduceat(contrib, starts, axis=1)
        d = 1.0 - dots
        alld = np.concatenate([best_d, d], 1)
        # sparse object ids are 1-based positions (core/dataset.py:116)
        alli = np.concatenate(
            [best_i, np.arange(s + 1, s + 1 + len(blk))[None, :].repeat(nq, 0)], 1
        )
        sel = np.argsort(alld, axis=1, kind="stable")[:, :K]
        best_d = np.take_along_axis(alld, sel, 1)
        best_i = np.take_along_axis(alli, sel, 1)
    for a, b in zip(np.asarray(ids)[:nq], best_i):
        hits += len(set(a[a >= 0]) & set(b)) / K
    return hits / nq


def recall(ids, gold):
    return float(np.mean([
        len(set(a[a >= 0]) & set(b[b >= 0])) / K
        for a, b in zip(np.asarray(ids), np.asarray(gold))
    ]))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "scan"
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    t0 = time.perf_counter()
    pts = sparse_like(N + NQ, vocab=VOCAB, nnz=64, seed=0)
    emit(event="dataset", s=round(time.perf_counter() - t0, 1))
    corpus, q = pts[:N], pts[N : N + NQ]
    try:
        if stage == "scan":
            ex = Index("cosinesimil_sparse", method="seq_search",
                       data_type=DataKind.SPARSE)
            ex.add_sparse_batch(corpus)
            t0 = time.perf_counter()
            ex.build_index(Params(chunkSize=2048))
            emit(event="encode_ok", s=round(time.perf_counter() - t0, 1))
            d, i = ex.knn_query_batch(q, K)
            t0 = time.perf_counter()
            d, i = ex.knn_query_batch(q, K)
            dt = time.perf_counter() - t0
            np.savez("/tmp/gold_sparse1m.npz", ids=np.asarray(i))
            emit(stage="scan", qps=round(NQ / dt, 1))
            t0 = time.perf_counter()
            spot = f64_check(corpus, q, i)
            emit(stage="scan", f64_spot_recall=round(spot, 4),
                 f64_s=round(time.perf_counter() - t0, 1))
        else:
            gpath = "/tmp/gold_sparse1m.npz"
            if not os.path.exists(gpath):
                # /tmp gold wiped (VM reset) — regenerate via exact scan
                ex = Index("cosinesimil_sparse", method="seq_search",
                           data_type=DataKind.SPARSE)
                ex.add_sparse_batch(corpus)
                ex.build_index(Params(chunkSize=2048))
                _, gi = ex.knn_query_batch(q, K)
                np.savez(gpath, ids=np.asarray(gi))
                del ex
            gold = np.load(gpath)["ids"]
            idx = Index("cosinesimil_sparse", method="napp",
                        data_type=DataKind.SPARSE)
            idx.add_sparse_batch(corpus)
            t0 = time.perf_counter()
            idx.build_index(Params(numPivot=512, numPivotIndex=32))
            emit(stage="napp", event="build_ok",
                 build_s=round(time.perf_counter() - t0, 1))
            for mt in (2, 3):
                idx.set_query_time_params(Params(minTimes=mt))
                d, i = idx.knn_query_batch(q, K)
                t0 = time.perf_counter()
                d, i = idx.knn_query_batch(q, K)
                dt = time.perf_counter() - t0
                emit(stage="napp", minTimes=mt, qps=round(NQ / dt, 1),
                     recall_at_10=round(recall(i, gold), 4))
    except Exception:
        emit(stage=stage, event="crash", err=traceback.format_exc()[-800:])
        raise SystemExit(2)


if __name__ == "__main__":
    main()
