"""Second-stage sparse-scan diagnosis. Round-2 diag #1 found BOTH device
dot formulations at 100k diverging from the host f64 oracle by O(data
scale) at the block level on TPU — while the same code at 8k on CPU
matches to 1e-6 AND the end-to-end qdense scan on TPU matches f64
EXACTLY. Contradictory unless the one-off eager block dispatches return
corrupted results, or the errors sit on entries that never reach a
top-10.

This dumps the error STRUCTURE for one chunk: per-formulation error
fraction, worst entries with actual values, row/col concentration, and
a repeat-dispatch bitwise check (device nondeterminism). Appends JSON
lines to /tmp/r2_sdiag2.jsonl.
"""

import json
import os

import numpy as np

LOG = "/tmp/r2_sdiag2.jsonl"
N, NQ = int(os.environ.get("SD2_N", 100_000)), 512


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import tpu_knn.ops.sparse as S
    from tpu_knn import Index
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, queries = pts[:N], pts[N : N + NQ]

    idx = Index("cosinesimil_sparse", method="seq_search",
                data_type=DataKind.SPARSE)
    idx.add_sparse_batch(corpus)
    idx.build_index()
    data = idx.method.data
    qenc = idx.method._scan_queries(queries)
    v_pad = data.extra["vocab_mark"].shape[0]

    C = 2048
    cols = jax.lax.dynamic_slice_in_dim(data.col, 0, C, 0)
    vals = jax.lax.dynamic_slice_in_dim(data.val, 0, C, 0)

    dq1 = np.asarray(S.dot_qdense(qenc["q_dense"], cols, vals))
    dq2 = np.asarray(S.dot_qdense(qenc["q_dense"], cols, vals))
    db1 = np.asarray(S.dot_blocked_dense(
        qenc["qcol"], qenc["qval"], cols, vals, v_pad, "float32"))
    db2 = np.asarray(S.dot_blocked_dense(
        qenc["qcol"], qenc["qval"], cols, vals, v_pad, "float32"))
    emit(repeat_bitwise_qdense=bool(np.array_equal(dq1, dq2)),
         repeat_bitwise_blocked=bool(np.array_equal(db1, db2)))

    # f64 oracle (sentinel-masked)
    ci = np.asarray(cols).astype(np.int64)
    cv = np.asarray(vals).astype(np.float64)
    qi = np.asarray(qenc["qcol"]).astype(np.int64)
    qv = np.asarray(qenc["qval"]).astype(np.float64)
    qd = np.zeros((NQ, v_pad))
    np.put_along_axis(qd, np.where(qi < v_pad, qi, 0),
                      np.where(qi < v_pad, qv, 0.0), axis=1)
    ci_s = np.where(ci < v_pad, ci, 0)
    cv_s = np.where(ci < v_pad, cv, 0.0)
    ref = np.einsum("qcn,cn->qc", qd[:, ci_s], cv_s, optimize=True)

    # ALSO pull the device q_dense and rebuild ref from IT (if encode
    # itself wrote a wrong table, this ref matches the device and the
    # one above doesn't)
    qd_dev = np.asarray(qenc["q_dense"]).astype(np.float64)
    ref_dev = np.einsum("qcn,cn->qc", qd_dev[:, ci_s], cv_s, optimize=True)
    emit(qdense_table_max_abs_diff=float(np.max(np.abs(qd_dev - qd[:, :qd_dev.shape[1]]))) if qd_dev.shape == qd.shape else
         {"host": list(qd.shape), "dev": list(qd_dev.shape)})

    for name, dev in (("qdense", dq1), ("blocked", db1)):
        err = np.abs(dev - ref)
        bad = err > 1e-3
        worst = np.argsort(err.ravel())[-5:][::-1]
        rows = np.unique(np.argwhere(bad)[:, 0])
        cols_bad = np.unique(np.argwhere(bad)[:, 1])
        emit(form=name,
             frac_bad=float(np.mean(bad)),
             n_bad_rows=int(rows.size), n_bad_cols=int(cols_bad.size),
             err_vs_refdev=float(np.max(np.abs(dev - ref_dev))),
             worst=[{"q": int(w // ref.shape[1]), "c": int(w % ref.shape[1]),
                     "dev": float(dev.ravel()[w]), "ref": float(ref.ravel()[w])}
                    for w in worst])


if __name__ == "__main__":
    main()
