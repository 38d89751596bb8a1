"""Host-f64 gold standard for sparse cosine benchmark datasets.

NEVER generate a sparse gold standard by running the device exact scan
and trusting it: the original /tmp/sparse_gold_100000.npz was produced
at 08:26 on 2026-08-18 — two hours BEFORE the scatter-hint fix (commit
958dea3) — with the hinted densify scatter that miscompiles on XLA:TPU
in 16-row bands. Its ids were wrong for queries 135–155 and 271
(recall 0.9602 vs f64 truth, r2_sdiag5.jsonl + host re-check), which
masqueraded as a "single-pass scan recall regression" for a whole
measurement cycle. The current device scan is exact (max |dist - f64|
~5e-8), but gold must come from an independent oracle.
"""

import numpy as np


def host_f64_gold(corpus, queries, k=10, vocab=30_000, space="cosine"):
    """Exact top-k (1-based sparse object ids) under cosine distance
    (space="cosine") or negated raw dot (space="negdot"), computed on
    host in float64. `corpus`/`queries` are sequences of
    (term_ids_1based, values) pairs as produced by eval.datasets
    sparse_like."""
    n = len(corpus)
    nnz = max(len(c) for c, _ in corpus)
    ccol = np.zeros((n, nnz), np.int64)
    cval = np.zeros((n, nnz), np.float64)
    cmask = np.zeros((n, nnz), bool)
    for i, (c, v) in enumerate(corpus):
        ccol[i, : len(c)] = np.asarray(c) - 1
        cval[i, : len(c)] = v
        cmask[i, : len(c)] = True
    cnorm = np.sqrt((cval**2).sum(1))
    out = np.zeros((len(queries), k), np.int64)
    for qi, (c, v) in enumerate(queries):
        qd = np.zeros(vocab, np.float64)
        qd[np.asarray(c) - 1] = v
        qn = np.sqrt((np.asarray(v, np.float64) ** 2).sum())
        dots = (np.where(cmask, qd[ccol], 0.0) * cval).sum(1)
        if space == "negdot":
            dist = -dots
        else:
            dist = 1.0 - dots / np.maximum(qn * cnorm, 1e-30)
        out[qi] = np.argsort(dist, kind="stable")[:k]
    return out + 1  # sparse object ids are 1-based (core/dataset.py:116)
