"""diag5: the recall bisect (r2_sscan_recall_bisect.py) found ALL scan
paths disagreeing with the device-generated gold at exactly 0.9602, and
f64 arbitration rejected BOTH sides for 16 CONSECUTIVE queries (135-150)
— the 16-row-band signature of the TPU scatter corruption the hint-fix
supposedly closed. Decide, against host f64 truth:

  1. TRUE gold: full f64 top-10 on host for all 512 queries; recall of
     the new single-pass ids and of the old device gold against it.
  2. q_dense band map: the device table (op-by-op scatter AND the jitted
     densify program) vs a host-built oracle — which rows/cols differ.
  3. Device distances for the disputed queries vs host f64 — is the
     corruption in the table, the dot, or the merge?

Saves /tmp/sparse_gold_100000_f64.npz (the host-truth gold all future
sparse recall numbers should use).
"""

import json

import numpy as np

LOG = "/tmp/r2_sdiag5.jsonl"
N, NQ, K, CHUNK = 100_000, 512, 10, 1024


def emit(**kw):
    with open(LOG, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_knn import Index, Params
    from tpu_knn.core.dataset import DataKind
    from tpu_knn.eval.datasets import sparse_like
    from tpu_knn.methods import seq_search as SS

    pts = sparse_like(N + NQ, vocab=30_000, nnz=64, seed=0)
    corpus, q = pts[:N], pts[N : N + NQ]
    old_gold = np.load(f"/tmp/sparse_gold_{N}.npz")["ids"]

    # ---- 1. host f64 truth ----
    ccol = np.zeros((N, 64), np.int64)
    cval = np.zeros((N, 64), np.float64)
    cmask = np.zeros((N, 64), bool)
    for i, (c, v) in enumerate(corpus):
        ccol[i, : len(c)] = np.asarray(c) - 1
        cval[i, : len(c)] = v
        cmask[i, : len(c)] = True
    cnorm = np.sqrt((cval**2).sum(1))
    true_ids = np.zeros((NQ, K), np.int64)
    host_dists = np.zeros((NQ, N))
    for qi in range(NQ):
        c, v = q[qi]
        qd = np.zeros(30_000, np.float64)
        qd[np.asarray(c) - 1] = v
        qn = np.sqrt((np.asarray(v, np.float64) ** 2).sum())
        dots = (np.where(cmask, qd[ccol], 0.0) * cval).sum(1)
        dist = 1.0 - dots / np.maximum(qn * cnorm, 1e-30)
        host_dists[qi] = dist
        true_ids[qi] = np.argsort(dist, kind="stable")[:K]
    np.savez(f"/tmp/sparse_gold_{N}_f64.npz", ids=true_ids)

    def recall(ids, ref):
        return float(np.mean([
            len(set(np.asarray(a)[np.asarray(a) >= 0].tolist()) & set(np.asarray(b).tolist())) / K
            for a, b in zip(ids, ref)
        ]))

    emit(kind="old_gold_vs_true", recall=round(recall(old_gold, true_ids), 4))

    # ---- device paths ----
    ex = Index("cosinesimil_sparse", method="seq_search", data_type=DataKind.SPARSE)
    ex.add_sparse_batch(corpus)
    ex.build_index(Params(chunkSize=CHUNK))
    m = ex.method
    space, data = m.space, m.data
    qenc = space.encode_queries(q)
    vm = {"vocab_mark": data.extra["vocab_mark"]}

    d, ids, _ = SS._knn_device(space, qenc, data, K, CHUNK, "float32")
    ids = np.asarray(ids)
    emit(kind="singlepass_vs_true", recall=round(recall(ids, true_ids), 4))

    # ---- 2. q_dense band map ----
    v_pad = data.extra["vocab_mark"].shape[0]
    from tpu_knn.ops import sparse as S

    # host oracle table (f32 math, f64-checked structure)
    host_qd = np.zeros((NQ, v_pad), np.float32)
    for qi, (c, v) in enumerate(q):
        cc = np.asarray(c) - 1
        keep = cc < v_pad
        host_qd[qi, cc[keep]] = np.asarray(v)[keep]

    # op-by-op scatter (its own dispatch, what diag4 proved exact)
    qd_op = np.asarray(S._densify(qenc["qcol"], qenc["qval"], v_pad))
    # the jitted whole-densify program (what production runs)
    qd_prog = np.asarray(
        jax.jit(lambda e, c: space.densify_queries(e, c)["q_dense"])(qenc, vm)
    )
    for tag, qd_dev in (("op_by_op", qd_op), ("jit_program", qd_prog)):
        bad = np.argwhere(qd_dev != host_qd)
        rows = sorted(set(bad[:, 0].tolist()))
        emit(kind="qdense_vs_host", tag=tag, n_bad_elems=int(bad.shape[0]),
             n_bad_rows=len(rows), bad_rows_head=rows[:24])

    # ---- 3. device distances for disputed queries vs host f64 ----
    dis = [qi for qi in range(NQ) if set(ids[qi]) != set(true_ids[qi])]
    emit(kind="disputed_queries", n=len(dis), head=dis[:40])
    probe = (dis + list(range(8)))[:8]
    sub = [q[i] for i in probe]
    sub_enc = space.encode_queries(sub)
    dd = np.asarray(
        SS._all_dists_device(space, sub_enc, data, CHUNK, "float32")
    )[:, :N]
    for j, qi in enumerate(probe):
        err = np.abs(dd[j] - host_dists[qi])
        emit(kind="dist_err", qi=qi, max_err=float(err.max()),
             n_gt_1e3=int((err > 1e-3).sum()),
             worst_doc=int(err.argmax()))


if __name__ == "__main__":
    main()
