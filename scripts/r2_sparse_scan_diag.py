"""TPU-side diagnosis of the sparse exact-scan A/B divergence: on the
real chip qdense=False scored recall 0.842 vs the qdense=True results,
while on CPU both match the f64 oracle exactly (bit-level, 20k-doc
repro) — so the defect is TPU-specific.

Isolates the BLOCK math from the scan/pass logic: scores a few corpus
chunks with both device formulations (dot_qdense gather vs
dot_blocked_dense scatter+MXU-HIGHEST matmul) and compares both against
a host f64 oracle for the same chunks. If the blocks agree and the scan
still diverges, the defect is in pass structure, not the dot.

Appends JSON lines to /tmp/r2_sdiag.jsonl.
"""

import json
import time

import numpy as np

import os

LOG = os.environ.get("SDIAG_LOG", "/tmp/r2_sdiag.jsonl")
N = int(os.environ.get("SDIAG_N", 100_000))
NQ, K = 512, 10


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.methods.seq_search as SS
    import tpu_knn.ops.sparse as S
    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, queries = pts[:N], pts[N : N + NQ]
    gpath = f"/tmp/sparse_gold_{N}.npz"
    gold = np.load(gpath)["ids"] if os.path.exists(gpath) else None

    # ---- block-level A/B on device ----
    idx = Index("cosinesimil_sparse", method="seq_search",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    idx.build_index()
    space, data = idx.method.space, idx.method.data
    qenc = idx.method._scan_queries(queries)  # default flag: q_dense present
    v_pad = data.extra["vocab_mark"].shape[0]
    emit(event="encoded", v_pad=int(v_pad),
         n_pad=int(data.ids.shape[0]),
         has_qdense="q_dense" in qenc,
         max_qcol=int(np.asarray(qenc["qcol"]).max()),
         max_xcol=int(np.asarray(data.col).max()))

    n_pad = int(data.ids.shape[0])
    C = min(2048, n_pad)
    for c0 in sorted({0, max(0, n_pad // 2 - C // 2), n_pad - C}):  # head/mid/tail
        cols = jax.lax.dynamic_slice_in_dim(data.col, c0, C, 0)
        vals = jax.lax.dynamic_slice_in_dim(data.val, c0, C, 0)
        dq = np.asarray(S.dot_qdense(qenc["q_dense"], cols, vals))
        db = np.asarray(S.dot_blocked_dense(
            qenc["qcol"], qenc["qval"], cols, vals, v_pad, "float32"))
        # f64 oracle for the same chunk. Padding slots carry INT32_MAX-
        # class sentinel column ids (so device gathers fall out of range
        # and contribute zero) — mask them out here instead of sizing a
        # table to the sentinel.
        ci = np.asarray(cols).astype(np.int64)
        cv = np.asarray(vals).astype(np.float64)
        qi = np.asarray(qenc["qcol"]).astype(np.int64)
        qv = np.asarray(qenc["qval"]).astype(np.float64)
        qd = np.zeros((NQ, v_pad))
        qi_safe = np.where(qi < v_pad, qi, 0)
        np.put_along_axis(qd, qi_safe, np.where(qi < v_pad, qv, 0.0), axis=1)
        ci_safe = np.where(ci < v_pad, ci, 0)
        cv_safe = np.where(ci < v_pad, cv, 0.0)
        ref = np.einsum("qcn,cn->qc", qd[:, ci_safe], cv_safe, optimize=True)
        emit(chunk=c0,
             max_err_qdense=float(np.max(np.abs(dq - ref))),
             max_err_blocked=float(np.max(np.abs(db - ref))),
             max_ab_diff=float(np.max(np.abs(dq - db))),
             ref_scale=float(np.max(np.abs(ref))))

    # ---- end-to-end scan A/B in THIS fresh process ----
    for flag in (True, False):
        SS.SPARSE_SCAN_QDENSE = flag
        jax.clear_caches()
        ex = Index("cosinesimil_sparse", method="seq_search",
                   data_type=DataKind.SPARSE)
        ex.add_sparse_batch(corpus)
        ex.build_index()
        d, i = ex.knn_query_batch(queries, K)
        i = np.asarray(i)
        if gold is None:
            emit(stage="scan_rerun", qdense=flag, recall_vs_gold=None)
            continue
        rec = float(np.mean([
            len(set(a[a >= 0]) & set(b)) / K for a, b in zip(i, gold)
        ]))
        emit(stage="scan_rerun", qdense=flag, recall_vs_gold=round(rec, 4))


if __name__ == "__main__":
    main()
