"""Referee for the sparse exact-scan discrepancy seen on TPU (round 2):
qdense=False scored recall@10 0.842 against the qdense=True gold — one
of the two 'exact' formulations is wrong, or the data is so tied that
last-ulp summation-order differences legitimately reshuffle top-10
membership.

Pure-numpy f64 oracle (no JAX): recompute cosine distances for the
exact dataset/queries of scripts/r2_sparse_quality.py, compare the TPU
gold (/tmp/sparse_gold_100000.npz) against the f64 top-10, and census
the tie structure at the k-th boundary. Prints JSON lines.
"""

import json
import os

import numpy as np

N, NQ, K = 100_000, 512, 10


def main():
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, queries = pts[:N], pts[N : N + NQ]

    vocab = 1 + max(int(ids.max()) for ids, _ in pts)
    nnz_max = max(len(ids) for ids, _ in pts)

    def pad(docs):
        ids = np.zeros((len(docs), nnz_max), np.int64)  # id 0 = unused pad
        vals = np.zeros((len(docs), nnz_max), np.float64)
        for r, (i, v) in enumerate(docs):
            ids[r, : len(i)] = i
            vals[r, : len(v)] = v
        return ids, vals

    x_ids, x_vals = pad(corpus)
    q_ids, q_vals = pad(queries)
    x_norm = np.maximum(np.linalg.norm(x_vals, axis=1), 1e-300)
    q_norm = np.maximum(np.linalg.norm(q_vals, axis=1), 1e-300)

    # densified queries over the vocabulary (id 0 stays 0: pad entries
    # contribute nothing); [NQ, V] f64 = ~123MB
    qd = np.zeros((NQ, vocab), np.float64)
    np.put_along_axis(qd, q_ids, q_vals, axis=1)
    qd[:, 0] = 0.0

    dist = np.empty((NQ, N), np.float64)
    CH = 1024
    for c0 in range(0, N, CH):
        c1 = min(c0 + CH, N)
        # [NQ, C, nnz]: query value at each corpus element id
        g = qd[:, x_ids[c0:c1]]
        sim = np.einsum("qcn,cn->qc", g, x_vals[c0:c1], optimize=True)
        dist[:, c0:c1] = 1.0 - sim / (q_norm[:, None] * x_norm[None, c0:c1])

    order = np.argsort(dist, axis=1, kind="stable")
    top = order[:, :K]
    dsort = np.take_along_axis(dist, order[:, : K + 64], axis=1)

    # tie census at the k-boundary: how many docs are within eps of the
    # k-th distance (membership among those is arbitrary under any
    # float summation order)
    kth = dsort[:, K - 1]
    for eps in (0.0, 1e-12, 1e-9, 1e-7, 1e-5):
        within = np.sum(dist <= (kth[:, None] + eps), axis=1)
        print(json.dumps({
            "eps": eps,
            "mean_docs_within_eps_of_kth": float(np.mean(within)),
            "frac_queries_with_boundary_ties": float(np.mean(within > K)),
        }))
    gap = dsort[:, K] - dsort[:, K - 1]
    print(json.dumps({
        "kth_gap_median": float(np.median(gap)),
        "kth_gap_p10": float(np.percentile(gap, 10)),
        "kth_gap_min": float(np.min(gap)),
    }))

    gpath = f"/tmp/sparse_gold_{N}.npz"
    if os.path.exists(gpath):
        gold = np.load(gpath)["ids"]
        # recall of the TPU qdense gold vs the f64 oracle, and an
        # eps-tolerant recall that accepts any doc within 1e-9 of the
        # k-th f64 distance (tie-legitimate membership)
        rec = np.mean([
            len(set(g[g >= 0]) & set(t)) / K for g, t in zip(gold, top)
        ])
        ok_tol = []
        for qi in range(NQ):
            lim = kth[qi] + 1e-9
            ids = gold[qi][gold[qi] >= 0]
            ok_tol.append(np.mean(dist[qi, ids] <= lim))
        print(json.dumps({
            "tpu_gold_recall_vs_f64": float(rec),
            "tpu_gold_tie_tolerant_recall": float(np.mean(ok_tol)),
        }))
    else:
        print(json.dumps({"tpu_gold": "missing"}))


if __name__ == "__main__":
    main()
