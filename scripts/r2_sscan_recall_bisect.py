"""The single-pass + in-jit-densify sparse scan returned recall 0.9602
vs the f64-verified gold at 100k on the chip (r2_spairs.jsonl) where the
old two-pass + eager-densify path measured 1.0 — an EXACT method went
wrong on TPU, invisibly to the CPU suite. Isolate which change did it:

  A: single-pass + in-jit densify   (shipped; expect 0.9602)
  B: single-pass + eager q_dense    (same program minus the in-jit scatter)
  C: two-pass    + in-jit densify
  D: two-pass    + eager q_dense    (the old production path; expect 1.0)

plus a bitwise probe (q_dense computed inside a jit program vs the eager
table) and an f64 host arbitration of mismatched queries (full exact
top-k over the corpus, not just candidate re-scoring) so "gold is wrong"
is also a checkable outcome. One process; scan programs have never
faulted the worker.
"""

import json
import time

import numpy as np

LOG = "/tmp/r2_srbisect.jsonl"
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
    gold = np.load(f"/tmp/sparse_gold_{N}.npz")["ids"]

    ex = Index("cosinesimil_sparse", method="seq_search", data_type=DataKind.SPARSE)
    ex.add_sparse_batch(corpus)
    ex.build_index(Params(chunkSize=CHUNK))
    m = ex.method
    space, data = m.space, m.data
    qenc = space.encode_queries(q)
    vm = {"vocab_mark": data.extra["vocab_mark"]}
    qenc_dense = jax.jit(space.densify_queries)(qenc, vm)
    float(jnp.sum(qenc_dense["q_dense"]))

    # bitwise probe: the same scatter inside a jit program
    qd_prog = jax.jit(lambda e, c: space.densify_queries(e, c)["q_dense"])(qenc, vm)
    diff = float(jnp.sum(jnp.abs(qd_prog - qenc_dense["q_dense"])))
    emit(kind="qdense_prog_vs_eager", absdiff=diff)

    def recall(ids):
        return float(
            np.mean([
                len(set(a[a >= 0]) & set(b)) / K
                for a, b in zip(np.asarray(ids), gold)
            ])
        )

    results = {}
    for tag, fn, enc in (
        ("A_single_injit", SS._knn_device, qenc),
        ("B_single_eager", SS._knn_device, qenc_dense),
        ("C_twopass_injit", SS._knn_device_twopass, qenc),
        ("D_twopass_eager", SS._knn_device_twopass, qenc_dense),
    ):
        out = fn(space, enc, data, K, CHUNK, "float32")
        float(jnp.sum(out[0]))
        t0 = time.perf_counter()
        out = fn(space, enc, data, K, CHUNK, "float32")
        d, ids = out[0], out[1]
        float(jnp.sum(d))
        dt = time.perf_counter() - t0
        ids = np.asarray(ids)
        results[tag] = (ids, np.asarray(d))
        emit(kind="config", tag=tag, recall=round(recall(ids), 4),
             qps=round(NQ / dt, 1))

    # f64 arbitration: exact host top-K for queries where A disagrees
    # with gold (1-based ids -> 0-based columns).
    a_ids = results["A_single_injit"][0]
    bad = [qi for qi in range(NQ) if set(a_ids[qi]) != set(gold[qi])][:16]
    ccol = np.zeros((N, 64), np.int64)
    cval = np.zeros((N, 64), np.float64)
    for i, (c, v) in enumerate(corpus):
        ccol[i, : len(c)] = np.asarray(c) - 1
        cval[i, : len(c)] = v
    cmask = np.zeros((N, 64), bool)
    for i, (c, _) in enumerate(corpus):
        cmask[i, : len(c)] = True
    cnorm = np.sqrt((cval**2).sum(1))
    verdicts = {"gold": 0, "A": 0, "neither": 0}
    for qi in bad:
        c, v = q[qi]
        qd = np.zeros(30_001, np.float64)
        qd[np.asarray(c) - 1] = v
        qn = np.sqrt((np.asarray(v, np.float64) ** 2).sum())
        dots = (np.where(cmask, qd[ccol], 0.0) * cval).sum(1)
        dist = 1.0 - dots / np.maximum(qn * cnorm, 1e-30)
        true_ids = set(np.argsort(dist, kind="stable")[:K].tolist())
        ga, aa = set(gold[qi].tolist()), set(a_ids[qi].tolist())
        if ga == true_ids and aa != true_ids:
            verdicts["gold"] += 1
        elif aa == true_ids and ga != true_ids:
            verdicts["A"] += 1
        else:
            verdicts["neither"] += 1
            # tie diagnosis: margin between gold's and A's disputed rows
            only_g, only_a = ga - aa, aa - ga
            emit(kind="tie_detail", qi=qi,
                 g_dists=[float(dist[i]) for i in sorted(only_g)][:4],
                 a_dists=[float(dist[i]) for i in sorted(only_a)][:4])
    emit(kind="arbitration", n_bad=len(bad), **verdicts)


if __name__ == "__main__":
    main()
