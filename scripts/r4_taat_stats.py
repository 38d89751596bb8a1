"""Host-side arithmetic for the inverted/term-at-a-time sparse scoring
arm (VERDICT r3 'do this' #3): on the 1M benchmark distribution
(eval/datasets.sparse_like, vocab 60k, nnz<=64), how many posting
entries does a TAAT pass touch per query batch vs the gather scan's
irreducible C*nnz granules?

The gather scan is granule-count-bound at ~54M granules/s (BASELINE.md
round-3 roofline): C*nnz granules per sweep regardless of nq. A batched
TAAT engine scans each term's posting list once per batch and touches
sum_{t in union(batch terms)} |P_t| postings; its best-case speedup is
C*nnz / union_postings (assuming posting-stream processing runs at or
above the gather-engine granule rate). This script prints that ratio
for nq in {1..4096} plus the head-coverage curve, BEFORE we build
anything — the design decision is data-driven either way.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    vocab = 30_000 if n <= 100_000 else 60_000
    from tpu_knn.eval.datasets import sparse_like

    t0 = time.time()
    pts = sparse_like(n + 2048, vocab=vocab, nnz=64, seed=0)
    print(f"# dataset loaded in {time.time()-t0:.1f}s", file=sys.stderr)
    corpus, queries = pts[:n], pts[n:]

    # posting lengths: |P_t| for every term (0-based)
    all_ids = np.concatenate([c for c, _ in corpus]) - 1
    plen = np.bincount(all_ids, minlength=vocab).astype(np.int64)
    total_postings = int(plen.sum())
    avg_nnz = total_postings / n

    # head coverage: top-H terms by posting length
    order = np.argsort(-plen)
    csum = np.cumsum(plen[order])
    head = {H: float(csum[H - 1] / total_postings)
            for H in (128, 512, 1024, 4096, 16384) if H <= vocab}

    out = {
        "n": n, "vocab": vocab, "total_postings": total_postings,
        "avg_nnz": round(avg_nnz, 2),
        "plen_max": int(plen.max()), "plen_mean": round(float(plen.mean()), 1),
        "plen_p50": int(np.median(plen)), "plen_p99": int(np.quantile(plen, 0.99)),
        "head_coverage": head,
    }

    # batch-union postings touched, per nq
    rng = np.random.default_rng(0)
    rows = []
    for nq in (1, 32, 128, 512, 2048, 4096):
        if nq > len(queries):
            break
        trials = 4 if nq <= 128 else 1
        touched = []
        qterms_tot = []
        for t in range(trials):
            qs = queries[:nq] if t == 0 else [
                queries[i] for i in rng.choice(len(queries), nq, replace=False)]
            union = np.unique(np.concatenate([c for c, _ in qs]) - 1)
            touched.append(int(plen[union].sum()))
            qterms_tot.append(sum(len(c) for c, _ in qs))
        tp = float(np.mean(touched))
        # per-QUERY posting sum (the nq=1 amortization ceiling): each
        # query alone would touch sum_{t in q} |P_t|
        rows.append({
            "nq": nq, "union_terms": int(len(union)),
            "union_postings": int(tp),
            "frac_of_corpus_postings": round(tp / total_postings, 4),
            "taat_best_speedup_vs_gather": round(total_postings / tp, 2),
            "postings_per_query": int(tp / nq),
            "gather_granules_per_query": int(total_postings / nq),
        })
    out["batches"] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
